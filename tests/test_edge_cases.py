"""Edge coverage: compressed inputs, wide k-mers, unusual corpora."""

import bz2
import gzip
import lzma

import numpy as np
import pytest

from conftest import mutate_dna, random_dna


def test_compressed_file_formats(tmp_path):
    """gz / xz / bz2 / zst inputs build and match plain files
    (reference: files.rs:117-137 suffix handling + needletail zstd)."""
    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(55)
    g = random_dna(rng, 9000)
    fasta = b">g plain\n" + g + b"\n"
    db = tmp_path / "db"
    db.mkdir()
    (db / "a.fna").write_bytes(fasta)
    (db / "b.fna.gz").write_bytes(gzip.compress(fasta))
    (db / "c.fasta.xz").write_bytes(lzma.compress(fasta))
    (db / "d.fa.bz2").write_bytes(bz2.compress(fasta))
    expected = 4
    try:
        import zstandard

        (db / "e.fna.zst").write_bytes(zstandard.compress(fasta))
        expected = 5
    except ImportError:
        pass
    out = str(tmp_path / "idx")
    rc = main(["tohnsw", "-d", str(db), "-k", "12", "-s", "256", "-n", "8",
               "--algo", "optdens", "--block", "-o", out])
    assert rc == 0
    import json, os
    state = json.load(open(os.path.join(out, "processing_state.json")))
    assert state["nb_file"] == expected
    # identical content -> identical signatures -> distance 0 among all
    sigs = np.load(os.path.join(out, "index.sigs.npy"))
    assert sigs.shape[0] == expected
    assert (sigs == sigs[0]).all()


@pytest.mark.parametrize("k", [21, 32])
def test_wide_kmer_end_to_end(tmp_path, k):
    """k up to 32 (u32 lane-pair k-mers) through the full CLI."""
    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(77 + k)
    db = tmp_path / "db"
    q = tmp_path / "q"
    db.mkdir()
    q.mkdir()
    genomes = [random_dna(rng, 8000) for _ in range(4)]
    for i, g in enumerate(genomes):
        (db / f"g{i}.fna").write_bytes(b">g%d\n" % i + g + b"\n")
    (q / "qq.fna").write_bytes(b">qq\n" + mutate_dna(rng, genomes[2], 0.005) + b"\n")
    out = str(tmp_path / "idx")
    rc = main(["tohnsw", "-d", str(db), "-k", str(k), "-s", "512", "-n", "8",
               "--algo", "optdens", "--block", "-o", out])
    assert rc == 0
    rc = main(["request", "-b", out, "-n", "2", "-r", str(q), "-o", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    best = [l for l in text.splitlines() if l.startswith("query_id:")][0]
    assert "g2.fna" in best, best


def test_header_with_gt_character(tmp_path):
    """Headers containing '>' in the description parse as ONE record."""
    from gsearch_tpu.io.fasta import parse_fasta

    data = b">seq1 len>5000 cov>10\nACGTACGT\nGGTT\n>seq2\nTTTT\n"
    recs = list(parse_fasta(data=data))
    assert [r.fasta_id for r in recs] == ["seq1", "seq2"]
    assert recs[0].seq == b"ACGTACGTGGTT"


def test_empty_and_tiny_records_skipped(tmp_path):
    """Records shorter than k are excluded from the index entirely."""
    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(5)
    db = tmp_path / "db"
    db.mkdir()
    (db / "good.fna").write_bytes(b">g\n" + random_dna(rng, 5000) + b"\n")
    (db / "tiny.fna").write_bytes(b">t\nACGT\n")          # < k
    (db / "ns.fna").write_bytes(b">n\n" + b"N" * 100 + b"\n")  # no valid k-mers... but length >= k
    out = str(tmp_path / "idx")
    rc = main(["tohnsw", "-d", str(db), "-k", "12", "-s", "128", "-n", "4",
               "--algo", "optdens", "--block", "-o", out])
    assert rc == 0
    import json, os
    state = json.load(open(os.path.join(out, "processing_state.json")))
    assert state["nb_seq"] == 2  # tiny.fna skipped; all-N kept but harmless
    sigs = np.load(os.path.join(out, "index.sigs.npy"))
    # the all-N genome must not match the real genome
    assert (sigs[0] == sigs[1]).mean() < 0.05
