"""Native C++ parser vs pure-Python parser equivalence."""

import numpy as np
import pytest

from gsearch_tpu.io import fasta as F
from gsearch_tpu.io.native import get_lib, native_concat_codes, native_records_codes

FASTA = (
    b">rec1 first record\nACGTACGT\nNNGGTT\n"
    b">rec2_capsid protein\nAAAA\n"
    b">rec3\nTT\nGGCCA\r\n"
    b">tiny\nAC\n"
)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library not built")
    return lib


def _py_concat(data, is_aa, min_size):
    enc = F._encoder(is_aa)
    parts, first_id, total = [], "", 0
    for rec in F.parse_fasta(data=data):
        if not F._keep(rec, min_size):
            continue
        if not first_id:
            first_id = rec.fasta_id
        if parts:
            parts.append(np.array([255], np.uint8))
        c = enc(rec.seq)
        total += len(c)
        parts.append(c)
    codes = np.concatenate(parts) if parts else np.empty(0, np.uint8)
    return codes, first_id, total


@pytest.mark.parametrize("min_size", [0, 5])
def test_concat_native_vs_python(lib, min_size):
    got = native_concat_codes(FASTA, False, min_size)
    want = _py_concat(FASTA, False, min_size)
    np.testing.assert_array_equal(got[0], want[0])
    assert got[1] == want[1]
    assert got[2] == want[2]


def test_records_native_vs_python(lib):
    got = native_records_codes(FASTA, False, 0)
    ids = [g[1] for g in got]
    assert ids == ["rec1", "rec3", "tiny"]  # capsid dropped
    np.testing.assert_array_equal(got[0][0][:8], [0, 1, 2, 3, 0, 1, 2, 3])
    assert (got[0][0][8:10] == 255).all()  # NN -> invalid


def test_concat_on_random_large(lib, rng):
    # a larger randomized file exercises buffer handling
    recs = []
    for i in range(50):
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=rng.integers(10, 2000)))
        recs.append(b">r%d x\n" % i + seq + b"\n")
    data = b"".join(recs)
    got = native_concat_codes(data, False, 0)
    want = _py_concat(data, False, 0)
    np.testing.assert_array_equal(got[0], want[0])
    assert got[2] == want[2]
