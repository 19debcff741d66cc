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


def test_add_migrates_flat_past_auto_limit(tmp_path, monkeypatch):
    """An `add` that grows a flat DB past the flat auto-limit converts it
    to an hnsw index (no OOM route through pipeline.add_to_database)."""
    import numpy as np

    from gsearch_tpu import pipeline
    from gsearch_tpu.core import ComputingParams, HnswParams, ProcessingParams
    from gsearch_tpu.core.params import SeqSketcherParams
    from gsearch_tpu.index.serialize import load_index

    rng = np.random.default_rng(0)

    def write_dir(d, n_files, tag):
        d.mkdir(exist_ok=True)
        for i in range(n_files):
            seq = "".join(rng.choice(list("ACGT"), 400))
            (d / f"{tag}{i}.fna").write_text(f">{tag}{i}\n{seq}\n")

    build_dir, add_dir, db = tmp_path / "b", tmp_path / "a", tmp_path / "db"
    write_dir(build_dir, 6, "base")
    write_dir(add_dir, 6, "new")
    params = ProcessingParams(
        hnsw=HnswParams(capacity=1000, ef=32, max_nb_conn=8,
                        scale_modification=1.0),
        sketch=SeqSketcherParams(kmer_size=8, sketch_size=64, algo="OPTDENS",
                                 data_t="DNA"),
        block_flag=True,
    )
    pipeline.build_database(str(build_dir), str(db), params,
                            ComputingParams(), index_kind="flat")
    assert load_index(str(db)).KIND == "flat"

    # shrink the auto-limit so the add crosses it
    monkeypatch.setattr(pipeline, "FLAT_AUTO_CAP", 8)
    res = pipeline.add_to_database(str(db), str(add_dir), ComputingParams())
    assert res["nb_points"] == 12
    migrated = load_index(str(db))
    assert migrated.KIND == "hnsw"
    assert migrated.nb_points == 12
