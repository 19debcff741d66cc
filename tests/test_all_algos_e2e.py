"""Regression net: build + request end-to-end for EVERY sketching algorithm
(the reference's 6 modes, src/bin/gsearch.rs:181-196)."""

import numpy as np
import pytest

from gsearch_tpu.core.params import SketchAlgo

from conftest import mutate_dna, random_dna

K = 12
S = 512


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(99)
    root = tmp_path_factory.mktemp("allalgo")
    db = root / "db"
    q = root / "q"
    db.mkdir()
    q.mkdir()
    genomes = [random_dna(rng, 10_000) for _ in range(6)]
    for i, g in enumerate(genomes):
        (db / f"g{i}.fna").write_bytes(b">g%d\n" % i + g + b"\n")
    (q / "qq.fna").write_bytes(b">qq\n" + mutate_dna(rng, genomes[1], 0.01) + b"\n")
    return root


@pytest.mark.parametrize("algo", [a.value.lower() for a in SketchAlgo])
def test_algo_end_to_end(corpus, algo, tmp_path):
    from gsearch_tpu.cli.main import main

    cli_name = {"prob3a": "prob"}.get(algo, algo)
    out_db = str(tmp_path / f"db_{algo}")
    rc = main(["tohnsw", "-d", str(corpus / "db"), "-k", str(K), "-s", str(S),
               "-n", "8", "--ef", "64", "--algo", cli_name, "--block", "-o", out_db])
    assert rc == 0
    rc = main(["request", "-b", out_db, "-n", "3", "-r", str(corpus / "q"),
               "-o", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert q_lines, f"{algo}: no answers"
    assert "g1.fna" in q_lines[0], f"{algo}: best hit wrong: {q_lines[0]}"


def test_genepred_train_file(tmp_path):
    """JSON codon-usage train files load and bias predictions."""
    import json

    from gsearch_tpu.cli.genepred import load_train_model
    from gsearch_tpu.models.genepred import _codon_id

    usage = {"ATG": 0.5, "GCC": 0.5}
    p = tmp_path / "train.json"
    p.write_text(json.dumps({"codon_usage": usage}))
    logu, model = load_train_model(str(p))
    assert model is None and logu.shape == (64,)
    assert logu[_codon_id("ATG")] > logu[_codon_id("AAA")]
    std, model = load_train_model("standard")
    assert model is None and std.shape == (64,)
