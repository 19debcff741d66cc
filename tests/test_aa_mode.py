"""Amino-acid mode end-to-end: proteome build + AAI-style search
(reference: src/aa/* — .faa ingest, 5-bit k-mers, no reverse complement)."""

import numpy as np
import pytest

from gsearch_tpu.io.codec import AA_ALPHABET

K = 7
S = 512


def _random_prot(rng, n):
    return bytes(rng.choice(np.frombuffer(AA_ALPHABET.encode(), np.uint8), size=n))


def _mutate_prot(rng, seq, rate):
    a = np.frombuffer(seq, np.uint8).copy()
    pos = rng.choice(len(a), int(len(a) * rate), replace=False)
    a[pos] = rng.choice(np.frombuffer(AA_ALPHABET.encode(), np.uint8), size=len(pos))
    return a.tobytes()


def test_aa_build_and_request(tmp_path):
    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(17)
    db_dir = tmp_path / "proteomes"
    q_dir = tmp_path / "queries"
    db_dir.mkdir()
    q_dir.mkdir()
    prots = [_random_prot(rng, 20_000) for _ in range(5)]
    for i, p in enumerate(prots):
        (db_dir / f"prot{i}.faa").write_bytes(b">p%d\n" % i + p + b"\n")
    (q_dir / "qp.faa").write_bytes(b">qp\n" + _mutate_prot(rng, prots[2], 0.03) + b"\n")

    out_db = str(tmp_path / "aadb")
    rc = main([
        "tohnsw", "-d", str(db_dir), "-k", str(K), "-s", str(S), "-n", "8",
        "--ef", "64", "--algo", "prob", "--aa", "--block", "-o", out_db,
    ])
    assert rc == 0
    rc = main(["request", "-b", out_db, "-n", "3", "-r", str(q_dir), "-o", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert q_lines and "prot2.faa" in q_lines[0], q_lines[:1]


def test_dna_to_protein_chain(tmp_path):
    """The reference's universal-gene workflow: predict each genome's
    proteome with the FragGeneScan role, then build + search an AA
    database over the predicted .faa files (README.md:607-660 analog:
    FragGeneScanRs -> tohnsw --aa -> request)."""
    from gsearch_tpu.cli.main import main
    from gsearch_tpu.models.genepred import predict_genes
    from tests.test_genepred import _biased_gene, _biased_params, _random_at_rich

    rng = np.random.default_rng(23)
    params = _biased_params()
    genomes = []
    for _ in range(4):
        parts = []
        for _g in range(3):
            parts.append(_random_at_rich(rng, 250))
            parts.append(_biased_gene(rng, 110))
        parts.append(_random_at_rich(rng, 250))
        genomes.append(b"".join(parts))

    def proteome(seq):
        genes = predict_genes(seq, params)
        assert genes, "gene prediction found nothing"
        return b"".join(
            b">g%d\n%s\n" % (i, g.aa.encode()) for i, g in enumerate(genes)
        )

    db_dir, q_dir = tmp_path / "faa", tmp_path / "q"
    db_dir.mkdir()
    q_dir.mkdir()
    for i, g in enumerate(genomes):
        (db_dir / f"genome{i}.faa").write_bytes(proteome(g))
    # query: the same organism as genome 1, 1% diverged at the DNA level
    a = np.frombuffer(genomes[1], np.uint8).copy()
    pos = rng.choice(len(a), len(a) // 100, replace=False)
    a[pos] = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=len(pos))
    (q_dir / "query.faa").write_bytes(proteome(a.tobytes()))

    out_db = str(tmp_path / "aadb")
    rc = main([
        "tohnsw", "-d", str(db_dir), "-k", "5", "-s", "256", "-n", "4",
        "--ef", "64", "--algo", "optdens", "--aa", "--block", "-o", out_db,
    ])
    assert rc == 0
    rc = main(["request", "-b", out_db, "-n", "2", "-r", str(q_dir),
               "-o", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert q_lines and "genome1.faa" in q_lines[0], q_lines[:1]


def test_aa_kmer_size_guard():
    from gsearch_tpu.core.params import SeqSketcherParams

    with pytest.raises(ValueError):
        SeqSketcherParams(kmer_size=13, sketch_size=64, algo="OPTDENS", data_t="AA")
