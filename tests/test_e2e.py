"""End-to-end: tohnsw build -> request -> reformat on a synthetic corpus.

The golden workflow of the reference README (README.md:607-660) on
generated genomes: queries are mutated copies of database genomes, so their
nearest neighbor must be their source genome and ANI must decrease with
mutation rate.
"""

import os

import numpy as np
import pytest

from conftest import mutate_dna, random_dna

K = 12
S = 512
GENOME = 15_000
NB_DB = 12


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("corpus")
    db_dir = root / "db_genomes"
    req_dir = root / "queries"
    db_dir.mkdir()
    req_dir.mkdir()
    genomes = [random_dna(rng, GENOME) for _ in range(NB_DB)]
    for i, g in enumerate(genomes):
        (db_dir / f"genome{i:02d}.fna").write_bytes(b">g%d chromosome\n" % i + g + b"\n")
    # queries: mutated copies of genomes 0..2 at increasing divergence
    rates = [0.005, 0.02, 0.05]
    for i, rate in enumerate(rates):
        q = mutate_dna(rng, genomes[i], rate)
        (req_dir / f"query{i}.fna").write_bytes(b">q%d mutant\n" % i + q + b"\n")
    return {"root": root, "db_dir": db_dir, "req_dir": req_dir, "rates": rates}


@pytest.mark.smoke
def test_build_request_reformat(corpus):
    from gsearch_tpu.cli.main import main

    out_db = str(corpus["root"] / "database")
    rc = main(
        [
            "tohnsw",
            "-d", str(corpus["db_dir"]),
            "-k", str(K),
            "-s", str(S),
            "-n", "16",
            "--ef", "64",
            "--algo", "optdens",
            "--block",
            "-o", out_db,
        ]
    )
    assert rc == 0
    for fname in [
        "parameters.json", "seqdict.json", "processing_state.json",
        "index.meta.json", "index.sigs.npy",
    ]:
        assert os.path.exists(os.path.join(out_db, fname)), fname

    out_dir = str(corpus["root"])
    rc = main(
        ["request", "-b", out_db, "-n", "5", "-r", str(corpus["req_dir"]), "-o", out_dir]
    )
    assert rc == 0
    neighbors = os.path.join(out_dir, "gsearch.neighbors.txt")
    text = open(neighbors).read()
    # each query's best hit is its source genome
    for i in range(3):
        q_lines = [
            l for l in text.splitlines()
            if l.startswith("query_id:") and f"query{i}.fna" in l
        ]
        assert q_lines, f"query{i} missing from answers"
        best = q_lines[0]
        assert f"genome{i:02d}.fna" in best, best

    tsv = os.path.join(out_dir, "ani.tsv")
    rc = main(["reformat", str(K), "1", neighbors, tsv])
    assert rc == 0
    rows = [l.split("\t") for l in open(tsv).read().splitlines()[1:]]
    assert rows and rows[0][0].startswith("query")
    # ANI of best hit decreases with mutation rate
    best_ani = {}
    for r in rows:
        q = r[0]
        ani = float(r[4])
        best_ani[q] = max(best_ani.get(q, 0.0), ani)
    assert best_ani["query0.fna"] > best_ani["query1.fna"] > best_ani["query2.fna"]
    assert best_ani["query0.fna"] > 95.0


def test_add_then_request(corpus):
    """add: grow a database, then find the added genome (SURVEY.md §3.3)."""
    import shutil

    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(11)
    root = corpus["root"]
    out_db = str(root / "database2")
    shutil.copytree(str(root / "database"), out_db)

    new_dir = root / "new_genomes"
    new_dir.mkdir(exist_ok=True)
    newg = random_dna(rng, GENOME)
    (new_dir / "newbie.fna").write_bytes(b">newbie\n" + newg + b"\n")

    rc = main(["add", "-b", out_db, "-n", str(new_dir)])
    assert rc == 0

    # query the added genome: must hit itself at distance ~0
    q_dir = root / "new_query"
    q_dir.mkdir(exist_ok=True)
    (q_dir / "newq.fna").write_bytes(b">newq\n" + newg + b"\n")
    out_dir = str(root / "addreq")
    os.makedirs(out_dir, exist_ok=True)
    rc = main(["request", "-b", out_db, "-n", "3", "-r", str(q_dir), "-o", out_dir])
    assert rc == 0
    text = open(os.path.join(out_dir, "gsearch.neighbors.txt")).read()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert "newbie.fna" in q_lines[0]
    assert "0.00000E0" in q_lines[0]


def test_build_with_hnsw_index(corpus, tmp_path):
    """--index hnsw builds a graph index through the CLI and request
    reloads it by its self-describing metadata."""
    import json

    from gsearch_tpu.cli.main import main

    out_db = str(tmp_path / "db_hnsw")
    rc = main([
        "tohnsw", "-d", str(corpus["db_dir"]), "-k", str(K), "-s", str(S),
        "-n", "8", "--ef", "48", "--algo", "optdens", "--block",
        "--index", "hnsw", "-o", out_db,
    ])
    assert rc == 0
    meta = json.load(open(os.path.join(out_db, "index.meta.json")))
    assert meta["kind"] == "hnsw"
    rc = main(["request", "-b", out_db, "-n", "3", "-r", str(corpus["req_dir"]),
               "-o", str(tmp_path)])
    assert rc == 0
    text = open(os.path.join(str(tmp_path), "gsearch.neighbors.txt")).read()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert q_lines and "genome00.fna" in q_lines[0]
