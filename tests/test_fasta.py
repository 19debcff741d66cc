import gzip
import os

import numpy as np

from gsearch_tpu.io.codec import DNA_INVALID
from gsearch_tpu.io.fasta import concat_file_codes, file_records_codes, parse_fasta
from gsearch_tpu.io.walk import is_fasta_aa_file, is_fasta_dna_file, walk_fasta_dir
import pytest

pytestmark = pytest.mark.smoke

FASTA = b">seq1 some description\nACGT\nACGT\n>seq2\nTTTT\n>capsid_x protein capsid\nGGGG\n"


def test_parse_fasta_records(tmp_path):
    p = tmp_path / "a.fna"
    p.write_bytes(FASTA)
    recs = list(parse_fasta(str(p)))
    assert [r.fasta_id for r in recs] == ["seq1", "seq2", "capsid_x"]
    assert recs[0].seq == b"ACGTACGT"
    assert recs[1].seq == b"TTTT"


def test_parse_gz(tmp_path):
    p = tmp_path / "a.fna.gz"
    p.write_bytes(gzip.compress(FASTA))
    recs = list(parse_fasta(str(p)))
    assert len(recs) == 3


def test_concat_block_skips_capsid_and_separates(tmp_path):
    p = tmp_path / "a.fna"
    p.write_bytes(FASTA)
    codes, first_id, total = concat_file_codes(str(p))
    assert first_id == "seq1"
    assert total == 12  # capsid record skipped (reference: dnafiles.rs:67)
    # one separator between the two kept records
    assert (codes == DNA_INVALID).sum() == 1
    assert len(codes) == 13


def test_records_mode_min_size(tmp_path):
    p = tmp_path / "a.fna"
    p.write_bytes(FASTA)
    recs = file_records_codes(str(p), min_seq_size=5)
    assert len(recs) == 1  # only seq1 (len 8) passes


def test_suffix_rules():
    assert is_fasta_dna_file("x.fna")
    assert is_fasta_dna_file("x.fasta.gz")
    assert is_fasta_dna_file("x.fa.xz")
    assert not is_fasta_dna_file("x.faa")
    assert is_fasta_aa_file("x.faa.bz2")
    assert not is_fasta_aa_file("x.fna")


def test_walk(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.fna").write_bytes(FASTA)
    (tmp_path / "sub" / "b.fasta").write_bytes(FASTA)
    (tmp_path / "notme.txt").write_bytes(b"hi")
    found = walk_fasta_dir(str(tmp_path))
    assert len(found) == 2
    assert found[0].endswith("a.fna")
