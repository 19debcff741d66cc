import numpy as np

from gsearch_tpu.io.codec import DNA_INVALID, decode_dna, encode_aa, encode_dna
import pytest

pytestmark = pytest.mark.smoke


def test_encode_dna_basic():
    codes = encode_dna(b"ACGTacgtN-")
    assert list(codes[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert codes[8] == DNA_INVALID
    assert codes[9] == DNA_INVALID


def test_encode_dna_rna_u():
    assert encode_dna(b"U")[0] == 3


def test_decode_roundtrip():
    seq = b"ACGTTGCA"
    assert decode_dna(encode_dna(seq)) == seq


def test_encode_aa():
    codes = encode_aa(b"ACDEFGHIKLMNPQRSTVWY")
    assert list(codes) == list(range(20))
    assert encode_aa(b"X*")[0] == DNA_INVALID
    assert encode_aa(b"X*")[1] == DNA_INVALID
