"""Per-sequence (non-block) mode: each FASTA record is indexed separately
and request aggregates per-target merits into gsearch.matches
(reference: matcher.rs + the block_flag=false path, SURVEY.md §3.2)."""

import os

import numpy as np

from conftest import mutate_dna, random_dna

K = 12
S = 512


def test_sequence_mode_build_request_matches(tmp_path):
    from gsearch_tpu.cli.main import main

    rng = np.random.default_rng(33)
    db_dir = tmp_path / "db"
    q_dir = tmp_path / "q"
    db_dir.mkdir()
    q_dir.mkdir()
    # two multi-record genome files (e.g. contigs)
    contigs_a = [random_dna(rng, 6000) for _ in range(4)]
    contigs_b = [random_dna(rng, 6000) for _ in range(4)]
    (db_dir / "genA.fna").write_bytes(
        b"".join(b">a%d\n" % i + c + b"\n" for i, c in enumerate(contigs_a)))
    (db_dir / "genB.fna").write_bytes(
        b"".join(b">b%d\n" % i + c + b"\n" for i, c in enumerate(contigs_b)))

    # query: mutated contigs of genome A
    (q_dir / "query.fna").write_bytes(
        b"".join(b">q%d\n" % i + mutate_dna(rng, c, 0.01) + b"\n"
                 for i, c in enumerate(contigs_a[:3])))

    out_db = str(tmp_path / "db_idx")
    # NOTE: no --block -> per-sequence mode
    rc = main(["tohnsw", "-d", str(db_dir), "-k", str(K), "-s", str(S),
               "-n", "8", "--ef", "64", "--algo", "optdens", "-o", out_db])
    assert rc == 0
    # 8 sequences indexed, not 2 files
    import json
    state = json.load(open(os.path.join(out_db, "processing_state.json")))
    assert state["nb_seq"] == 8
    assert state["nb_file"] == 2

    rc = main(["request", "-b", out_db, "-n", "3", "-r", str(q_dir),
               "-o", str(tmp_path)])
    assert rc == 0
    # per-sequence answers reference individual contigs
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    assert "genA.fna" in text
    # matcher output: genome A must be the best target of the query genome
    matches = (tmp_path / "gsearch.matches").read_text()
    assert "request genome" in matches
    first_match = [l for l in matches.splitlines() if "matched genome" in l][0]
    assert "genA.fna" in first_match, matches
