"""Companion-tool tests: bindash, hypermash, superaai, hnsw2knn, hnswcore."""

import os

import numpy as np
import pytest

from conftest import mutate_dna, random_dna

pytestmark = pytest.mark.smoke

K = 12
GENOME = 8_000


@pytest.fixture(scope="module")
def genome_lists(tmp_path_factory):
    rng = np.random.default_rng(21)
    root = tmp_path_factory.mktemp("tools")
    genomes = [random_dna(rng, GENOME) for _ in range(3)]
    paths = []
    for i, g in enumerate(genomes):
        p = root / f"g{i}.fna"
        p.write_bytes(b">g%d\n" % i + g + b"\n")
        paths.append(str(p))
    # q0 = mutated copy of g0; q1 = unrelated
    qpaths = []
    q0 = root / "q0.fna"
    q0.write_bytes(b">q0\n" + mutate_dna(rng, genomes[0], 0.01) + b"\n")
    q1 = root / "q1.fna"
    q1.write_bytes(b">q1\n" + random_dna(rng, GENOME) + b"\n")
    qpaths = [str(q0), str(q1)]
    qlist = root / "qlist.txt"
    rlist = root / "rlist.txt"
    qlist.write_text("\n".join(qpaths) + "\n")
    rlist.write_text("\n".join(paths) + "\n")
    return {"root": root, "qlist": str(qlist), "rlist": str(rlist)}


def _parse_tsv(path_or_text, from_file=True):
    text = open(path_or_text).read() if from_file else path_or_text
    rows = [l.split("\t") for l in text.strip().splitlines()[1:]]
    return {(r[0], r[1]): float(r[2]) for r in rows}


def test_bindash(genome_lists, tmp_path):
    from gsearch_tpu.cli.bindash import main

    out = str(tmp_path / "bindash.tsv")
    rc = main(["-q", genome_lists["qlist"], "-r", genome_lists["rlist"],
               "-k", str(K), "-s", "1024", "-o", out])
    assert rc == 0
    d = _parse_tsv(out)
    assert len(d) == 6
    root = str(genome_lists["root"])
    d_close = d[(f"{root}/q0.fna", f"{root}/g0.fna")]
    d_far = d[(f"{root}/q1.fna", f"{root}/g0.fna")]
    assert d_close < 0.05
    assert d_far > 0.2


def test_hypermash(genome_lists, tmp_path):
    from gsearch_tpu.cli.hypermash import main

    out = str(tmp_path / "hypermash.tsv")
    rc = main(["-q", genome_lists["qlist"], "-r", genome_lists["rlist"],
               "-k", str(K), "-b", "1024", "-o", out])
    assert rc == 0
    d = _parse_tsv(out)
    root = str(genome_lists["root"])
    assert d[(f"{root}/q0.fna", f"{root}/g0.fna")] < d[(f"{root}/q1.fna", f"{root}/g0.fna")]


def test_superaai(tmp_path_factory):
    from gsearch_tpu.cli.superaai import main

    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("aa")
    aa = b"ACDEFGHIKLMNPQRSTVWY"
    prot_a = bytes(rng.choice(np.frombuffer(aa, np.uint8), size=5000))
    # mutate 2%
    arr = np.frombuffer(prot_a, np.uint8).copy()
    pos = rng.choice(len(arr), size=100, replace=False)
    arr[pos] = rng.choice(np.frombuffer(aa, np.uint8), size=100)
    prot_b = arr.tobytes()
    prot_c = bytes(rng.choice(np.frombuffer(aa, np.uint8), size=5000))
    for name, p in [("a", prot_a), ("b", prot_b), ("c", prot_c)]:
        (root / f"{name}.faa").write_bytes(b">%s\n" % name.encode() + p + b"\n")
    qlist = root / "q.txt"
    rlist = root / "r.txt"
    qlist.write_text(f"{root}/b.faa\n{root}/c.faa\n")
    rlist.write_text(f"{root}/a.faa\n")
    out = str(root / "aai.tsv")
    rc = main(["-q", str(qlist), "-r", str(rlist), "-k", "5", "-s", "20", "-o", out])
    assert rc == 0
    d = _parse_tsv(out)
    aai_related = d[(f"{root}/b.faa", f"{root}/a.faa")]
    aai_unrelated = d[(f"{root}/c.faa", f"{root}/a.faa")]
    assert aai_related > 90.0
    assert aai_unrelated < aai_related


def test_hnsw2knn_and_hnswcore(tmp_path):
    from gsearch_tpu.cli.hnsw2knn import run_hnsw2knn
    from gsearch_tpu.cli.hnswcore import run_hnswcore
    from gsearch_tpu.core import (HnswParams, ProcessingParams, SeqDict,
                                   SeqSketcherParams)
    from gsearch_tpu.core.seqdict import Id, ItemDict
    from gsearch_tpu.index.flat import FlatIndex
    from gsearch_tpu.index.serialize import dumpall

    rng = np.random.default_rng(9)
    n, s = 60, 64
    sigs = rng.integers(0, 1 << 20, size=(n, s)).astype(np.uint32)
    idx = FlatIndex(sketch_size=s, sig_dtype=np.uint32)
    idx.insert(sigs)
    seqdict = SeqDict([ItemDict(id=Id(path=f"g{i}.fna", fasta_id=f"g{i}"), len=100)
                       for i in range(n)])
    params = ProcessingParams(
        hnsw=HnswParams(),
        sketch=SeqSketcherParams(kmer_size=16, sketch_size=s, algo="OPTDENS", data_t="DNA"),
    )
    dumpall(str(tmp_path), idx, seqdict, params)

    out = str(tmp_path / "knn.txt")
    nn = run_hnsw2knn(str(tmp_path), knbn=5, output=out)
    assert nn == n
    lines = open(out).read().strip().splitlines()
    assert len(lines) == n and lines[0].startswith("g0.fna:")

    res = run_hnswcore(str(tmp_path), nb_coreset=16, nb_cluster=4, out_dir=str(tmp_path))
    assert res["coreset_size"] == 16
    assert res["nb_cluster"] == 4
    assert (tmp_path / "coreset.csv").exists()
    assert (tmp_path / "clustercoreset.csv").exists()
    rows = open(tmp_path / "clustercoreset.csv").read().strip().splitlines()
    assert len(rows) == n + 1


def test_coreset_metrics():
    """pairwise_distance's l1/l2/cosine match numpy; each metric drives the
    full coreset pipeline (reference hnswcore dispatches the same distance
    set, binaux/src/bin/hnswcore.rs:432-462)."""
    from gsearch_tpu.analysis.coreset import (build_coreset, cluster_coreset,
                                              pairwise_distance)

    rng = np.random.default_rng(3)
    q = rng.random((5, 32)).astype(np.float32)
    db = rng.random((17, 32)).astype(np.float32)
    l1 = np.abs(q[:, None, :] - db[None, :, :]).sum(-1)
    l2 = np.sqrt(((q[:, None, :] - db[None, :, :]) ** 2).sum(-1))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dn = db / np.linalg.norm(db, axis=-1, keepdims=True)
    cos = 1.0 - qn @ dn.T
    np.testing.assert_allclose(np.asarray(pairwise_distance(q, db, "l1")), l1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pairwise_distance(q, db, "l2")), l2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pairwise_distance(q, db, "cosine")), cos, rtol=1e-4, atol=1e-5)

    sigs = rng.random((40, 16)).astype(np.float32)
    for metric in ("l1", "l2", "cosine"):
        core = build_coreset(sigs, 8, metric=metric)
        assert len(core.ids) == 8 and core.assignment.shape == (40,)
        clus = cluster_coreset(sigs, core, 3, metric=metric)
        assert len(clus.ids) == 3

    with pytest.raises(ValueError, match="unknown metric"):
        pairwise_distance(q, db, "chebyshev")
