"""superani (seed chaining) and bigsig (BIGSI read classification) tests."""

import numpy as np
import pytest

from conftest import mutate_dna, random_dna


def test_seedchain_ani(rng, tmp_path):
    from gsearch_tpu.cli.superani import run_superani

    g0 = random_dna(rng, 60_000)
    g1 = mutate_dna(rng, g0, 0.02)   # ~98% ANI
    g2 = random_dna(rng, 60_000)     # unrelated
    paths = []
    for name, g in (("a", g0), ("b", g1), ("c", g2)):
        p = tmp_path / f"{name}.fna"
        p.write_bytes(b">%s\n" % name.encode() + g + b"\n")
        paths.append(str(p))
    qlist = tmp_path / "q.txt"
    rlist = tmp_path / "r.txt"
    qlist.write_text(f"{paths[1]}\n{paths[2]}\n")
    rlist.write_text(f"{paths[0]}\n")
    out = str(tmp_path / "superani.tsv")
    n = run_superani(str(qlist), str(rlist), kmer=16, c=30, output=out)
    assert n == 2
    rows = {tuple(l.split("\t")[:2]): l.split("\t")[2:] for l in
            open(out).read().strip().splitlines()[1:]}
    ani_rel, afq_rel, afr_rel = map(float, rows[(paths[1], paths[0])])
    ani_unrel = float(rows[(paths[2], paths[0])][0])
    assert 94.0 < ani_rel <= 100.0, f"related ANI {ani_rel}"
    assert afq_rel > 0.5, f"aligned fraction {afq_rel}"
    assert ani_unrel < 80.0, f"unrelated ANI {ani_unrel}"


def test_seedchain_rearrangement(rng, tmp_path):
    """Chaining must tolerate a block swap (two diagonals)."""
    from gsearch_tpu.models.seedchain import SeedChainer
    from gsearch_tpu.io.codec import encode_dna

    g = random_dna(rng, 40_000)
    swapped = g[20_000:] + g[:20_000]
    ch = SeedChainer(k=16, c=30)
    sq = ch.sketch(encode_dna(swapped))
    sr = ch.sketch(encode_dna(g))
    ani, afq, afr = ch.compare(sq, sr)
    assert ani > 97.0, f"rearranged ANI {ani}"
    assert afq > 0.8


def test_bigsi_classify(rng, tmp_path):
    from gsearch_tpu.index.bigsi import BigsiIndex
    from gsearch_tpu.io.codec import encode_dna

    genomes = {f"g{i}": random_dna(rng, 30_000) for i in range(4)}
    idx = BigsiIndex(bloom_len=100_000, nb_hashes=2, kmer_size=21)
    for name, g in genomes.items():
        idx.insert_genome(name, encode_dna(g))
    assert idx.nb_genomes == 4

    # reads from g1 (exact) and g2 (1% mutated), plus junk
    read_len = 256
    reads, expected = [], []
    for i in range(6):
        src = "g1" if i % 2 == 0 else "g2"
        start = rng.integers(0, 30_000 - read_len)
        read = genomes[src][start : start + read_len]
        if src == "g2":
            read = mutate_dna(rng, read, 0.01)
        reads.append(encode_dna(read))
        expected.append(src)
    reads.append(encode_dna(random_dna(rng, read_len)))
    expected.append(None)

    results = idx.classify(np.stack(reads), min_fraction=0.5)
    for hits, exp in zip(results, expected):
        if exp is None:
            assert not hits, f"junk read classified: {hits}"
        else:
            assert hits, f"read from {exp} unclassified"
            assert hits[0][0] == exp, f"expected {exp}, got {hits[0]}"


def test_bigsi_minimizer_mode_and_io(rng, tmp_path):
    from gsearch_tpu.index.bigsi import BigsiIndex
    from gsearch_tpu.io.codec import encode_dna

    g = random_dna(rng, 20_000)
    idx = BigsiIndex(bloom_len=50_000, nb_hashes=2, kmer_size=21, minimizer_window=8)
    idx.insert_genome("g", encode_dna(g))
    prefix = str(tmp_path / "idx")
    idx.save(prefix)
    idx2 = BigsiIndex.load(prefix)
    read = encode_dna(g[1000:1256])
    res = idx2.classify(read[None, :], min_fraction=0.5)
    assert res[0] and res[0][0][0] == "g"
