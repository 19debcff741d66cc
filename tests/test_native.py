"""Native C++ parser vs pure-Python parser equivalence."""

import numpy as np
import pytest

from gsearch_tpu.io import fasta as F
from gsearch_tpu.io.native import (get_lib, native_concat_codes,
                                   native_concat_pack2, native_records_codes)

pytestmark = pytest.mark.smoke

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


def _fused(data, min_size=0):
    from gsearch_tpu.io.native import native_concat_pack2

    res = native_concat_pack2(data, min_size)
    assert res is not None
    return res


@pytest.mark.parametrize("min_size", [0, 5])
def test_concat_pack2_vs_python(lib, min_size):
    if not hasattr(lib, "fasta_concat_pack2"):
        pytest.skip("old .so without the fused parser")
    pk, fid, total = _fused(FASTA, min_size)
    codes, fid2, total2 = _py_concat(FASTA, False, min_size)
    np.testing.assert_array_equal(pk.to_codes(), codes)
    assert (fid, total) == (fid2, total2)
    # every invalid position is accounted for in inv, none elsewhere
    np.testing.assert_array_equal(np.flatnonzero(codes == 255), pk.inv)


def test_concat_pack2_random(lib, rng):
    if not hasattr(lib, "fasta_concat_pack2"):
        pytest.skip("old .so without the fused parser")
    recs = []
    for i in range(50):
        seq = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                   size=rng.integers(10, 2000)))
        npos = rng.choice(len(seq), max(1, len(seq) // 100), replace=False)
        for p in npos:
            seq[p] = ord("N")  # ~1% Ns: realistic, within the exc budget
        recs.append(b">r%d x\n" % i + bytes(seq) + b"\n")
    data = b"".join(recs)
    pk, fid, total = _fused(data)
    codes, fid2, total2 = _py_concat(data, False, 0)
    np.testing.assert_array_equal(pk.to_codes(), codes)
    assert (fid, total) == (fid2, total2)


def test_concat_pack2_fuzz_structure(lib, rng):
    """Structural fuzz of the single-pass fused parser: CRLF line wraps at
    widths straddling the 64-byte vector stride, lowercase/U, min_seq_size
    rollback of optimistically-packed records (incl. the separator), capsid
    skips, and >16 KB records crossing the compaction chunk boundary."""
    if not hasattr(lib, "fasta_concat_pack2"):
        pytest.skip("old .so without the fused parser")
    alph = np.frombuffer(b"ACGTacgtUuNacgt", np.uint8)
    for trial in range(25):
        recs = []
        for r in range(int(rng.integers(1, 6))):
            n = int(rng.integers(1, 40_000))
            seq = bytes(rng.choice(alph, n))
            width = int(rng.choice([0, 7, 63, 64, 65, 80]))
            if width:
                lines = [seq[i : i + width] for i in range(0, n, width)]
                eol = b"\r\n" if rng.random() < 0.5 else b"\n"
                seq = eol.join(lines)
            hdr = b">r%d capsid\n" % r if rng.random() < 0.2 else b">r%d x\n" % r
            recs.append(hdr + seq + b"\n")
        data = b"".join(recs)
        min_size = int(rng.choice([0, 100, 20_000]))
        codes, fid2, total2 = _py_concat(data, False, min_size)
        res = native_concat_pack2(data, min_size)
        if res is None:  # exception-budget overflow: legal fallback
            continue
        pk, fid, total = res
        np.testing.assert_array_equal(pk.to_codes(), codes)
        assert (fid, total) == (fid2, total2)
        np.testing.assert_array_equal(np.flatnonzero(codes == 255), pk.inv)


def test_packed_codes_piece():
    from gsearch_tpu.io.codec import PackedCodes

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 1000).astype(np.uint8)
    codes[rng.choice(1000, 30, replace=False)] = 255
    inv = np.flatnonzero(codes == 255).astype(np.int32)
    packed = np.zeros(250, np.uint8)
    c = np.where(codes == 255, 0, codes)
    packed = (c[0::4] | (c[1::4] << 2) | (c[2::4] << 4) | (c[3::4] << 6)).astype(np.uint8)
    pk = PackedCodes(packed, 1000, inv)
    np.testing.assert_array_equal(pk.to_codes(), codes)
    for start, length in [(0, 256), (256, 256), (996, 100), (0, 1000)]:
        np.testing.assert_array_equal(
            pk.piece(start, length).to_codes(), codes[start : start + length])


@pytest.mark.parametrize("algo", ["optdens", "prob3a"])
def test_packed_sketch_parity(lib, rng, algo):
    """A PackedCodes genome sketches identically to its code array, in
    both the batched (sketch_many) and streaming (long-genome) paths."""
    if not hasattr(lib, "fasta_concat_pack2"):
        pytest.skip("old .so without the fused parser")
    from gsearch_tpu.core.params import SeqSketcherParams, SketchAlgo
    from gsearch_tpu.models import make_sketcher

    params = SeqSketcherParams(
        kmer_size=16, sketch_size=64, algo=SketchAlgo(algo.upper()),
        data_t="DNA")
    recs, n_bases = [], 0
    i = 0
    while n_bases < 60_000:  # > the shrunken block below: streams pieces
        ln = int(rng.integers(500, 9000))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ln))
        recs.append(b">r%d\n" % i + seq + b"\n")
        n_bases += ln
        i += 1
    data = b"".join(recs)
    pk, _, _ = _fused(data)
    codes = pk.to_codes()

    sk = make_sketcher(params)
    sk.MAX_BLOCK_LOG2 = 15  # force streaming without a 4 Mb test genome
    ref = sk.sketch_codes(codes.copy())
    np.testing.assert_array_equal(sk.sketch_codes(pk), ref)
    np.testing.assert_array_equal(sk.sketch_many([pk])[0], ref)
    # short genome -> single-block batched path
    short_pk = pk.piece(0, 8000)
    np.testing.assert_array_equal(
        sk.sketch_many([short_pk])[0], sk.sketch_codes(short_pk.to_codes()))


def test_concat_pack2_overflow_falls_back(lib, rng, tmp_path):
    """An N-run-heavy file overflows the fused parser's exception budget;
    concat_file_codes_packed must hand back a plain code array."""
    if not hasattr(lib, "fasta_concat_pack2"):
        pytest.skip("old .so without the fused parser")
    from gsearch_tpu.io.fasta import concat_file_codes, concat_file_codes_packed
    from gsearch_tpu.io.native import native_concat_pack2

    seq = bytes(rng.choice(np.frombuffer(b"ACGTNNNN", np.uint8), size=40_000))
    data = b">gappy\n" + seq + b"\n"
    assert native_concat_pack2(data, 0) is None  # budget overflow
    got, fid, total = concat_file_codes_packed("x.fna", data=data)
    want, fid2, total2 = concat_file_codes("x.fna", data=data)
    assert isinstance(got, np.ndarray)
    np.testing.assert_array_equal(got, want)
    assert (fid, total) == (fid2, total2)
