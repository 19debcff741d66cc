"""Reference-database import: synthetic dumps written to the reference's
documented layout (dumpload.rs:15-62, idsketch.rs:164-253,
parameters.rs:178-218) round-trip into a native database."""

import json
import os
import struct

import numpy as np
import pytest

from gsearch_tpu.core.params import (HnswParams, ProcessingParams,
                                     SeqSketcherParams)
from gsearch_tpu.index.refimport import (fold_u64_sigs, import_reference_db,
                                         read_hnsw_data,
                                         read_reference_description,
                                         read_reference_seqdict,
                                         reference_sig_dtype)
from gsearch_tpu.index.serialize import load_index

_T_NAME = {np.dtype(np.float32): "f32", np.dtype(np.uint64): "u64",
           np.dtype(np.uint32): "u32", np.dtype(np.uint16): "u16"}


def _graph_description(t_name, *, n=0, dim=0, distname="DistHamming",
                       len_pack="u64"):
    """hnsw_rs graph-dump Description header, per the crate's bincode
    serialization of Description{dumpmode, max_nb_connection, nb_layer,
    ef, nb_point, dimension, distname, t_name} (the reference reads it
    via load_description, reloadhnsw.rs:13-37).  The leading magic is a
    placeholder: the crate's exact constant is not verifiable offline
    (the crate source is not vendored and this image has no network), and
    the importer by design never checks it — it locates the
    distname/t_name string pair, whose vocabulary is fixed."""
    packs = {"u64": "<Q", "u32": "<I", "u8": "<B"}

    def s(txt):
        return struct.pack(packs[len_pack], len(txt)) + txt.encode()

    return (struct.pack("<I", 0x2A3B4C5D)
            + struct.pack("<BBB", 1, 32, 16)
            + struct.pack("<QQQ", 64, n, dim)
            + s(distname) + s(t_name)
            + b"\x00" * 64)  # layer records, not parsed by the importer


def _write_reference_dump(d, sigs, *, algo="OPTDENS", kmer=16,
                          record_magic=True, record_len=True,
                          len_kind="u64", file_header=b""):
    """Synthesize a reference DB dir: hnsw_rs-style .data records
    ([u32 magic][u64 DataId][length][payload]; variants drop the magic or
    the length, or encode the length as a bincode-2-style varint),
    streamed-concatenated seqdict.json, parameters.json."""
    n, dim = sigs.shape

    def pack_len(nbytes: int) -> bytes:
        if len_kind == "u64":
            return struct.pack("<Q", dim)
        if len_kind == "u32":
            return struct.pack("<I", dim)
        # bincode 2 varint: <251 one byte, 0xFB+u16, 0xFC+u32, 0xFD+u64
        if nbytes < 251:
            return struct.pack("<B", nbytes)
        if nbytes <= 0xFFFF:
            return b"\xfb" + struct.pack("<H", nbytes)
        return b"\xfc" + struct.pack("<I", nbytes)

    with open(os.path.join(d, "hnswdump.hnsw.data"), "wb") as f:
        f.write(file_header)
        for i in range(n):
            if record_magic:
                f.write(struct.pack("<I", 0xA67F0CAFE & 0xFFFFFFFF))
            f.write(struct.pack("<Q", i))
            if record_len:
                f.write(pack_len(len(sigs[i].tobytes())))
            f.write(sigs[i].tobytes())
    with open(os.path.join(d, "seqdict.json"), "w") as f:
        for i in range(n):  # reference streamed form: concatenated objects
            f.write(json.dumps({"id": {"path": f"/data/g{i}.fna",
                                       "fasta_id": f"g{i}"},
                                "len": 1000 + i}))
    params = ProcessingParams(
        hnsw=HnswParams(capacity=1_500_000, ef=64, max_nb_conn=32,
                        scale_modification=1.0),
        sketch=SeqSketcherParams(kmer_size=kmer, sketch_size=dim, algo=algo,
                                 data_t="DNA"),
        block_flag=True,
    )
    params.dump_json(d)
    with open(os.path.join(d, "hnswdump.hnsw.graph"), "wb") as f:
        # realistic description header (read for its t_name; the layer
        # records are not needed — the graph is rebuilt on device)
        f.write(_graph_description(_T_NAME[sigs.dtype], n=n, dim=dim))


def test_seqdict_streamed_form(tmp_path):
    d = str(tmp_path)
    sigs = np.zeros((5, 8), np.float32)
    _write_reference_dump(d, sigs)
    sd = read_reference_seqdict(os.path.join(d, "seqdict.json"))
    assert len(sd) == 5
    assert sd[3].id.path == "/data/g3.fna"
    assert sd[3].id.fasta_id == "g3"
    assert sd[3].len == 1003


@pytest.mark.parametrize("record_magic,record_len", [
    (True, True), (True, False), (False, True), (False, False)])
def test_data_layout_detection(tmp_path, record_magic, record_len):
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    sigs = rng.random((37, 48)).astype(np.float32)
    _write_reference_dump(d, sigs, record_magic=record_magic,
                          record_len=record_len)
    got = read_hnsw_data(os.path.join(d, "hnswdump.hnsw.data"),
                         n=37, dim=48, dtype=np.float32)
    np.testing.assert_array_equal(got, sigs)


@pytest.mark.parametrize("record_magic,len_kind,file_header", [
    (True, "varint", b""),          # magic4 + id8 + varint -> odd overhead
    (False, "varint", b""),         # id8 + varint
    (True, "u32", b"HNSWDUMP"),     # u32 length + 8-byte file header
    (False, "u64", b"\x01\x02\x03\x04\x05"),  # odd 5-byte file header
])
def test_data_layout_varint_and_headers(tmp_path, record_magic, len_kind,
                                        file_header):
    """bincode-style varint length framing and odd file headers: a constant
    payload makes varints a fixed stride, which the exhaustive
    (header, overhead) grid + DataId validation recovers."""
    rng = np.random.default_rng(4)
    d = str(tmp_path)
    # payload 48*4=192 bytes < 251 -> 1-byte varint; also test a big-payload
    # 0xFB+u16 form below
    sigs = rng.random((37, 48)).astype(np.float32)
    _write_reference_dump(d, sigs, record_magic=record_magic,
                          record_len=True, len_kind=len_kind,
                          file_header=file_header)
    got = read_hnsw_data(os.path.join(d, "hnswdump.hnsw.data"),
                         n=37, dim=48, dtype=np.float32)
    np.testing.assert_array_equal(got, sigs)


def test_data_layout_varint_u16_form(tmp_path):
    """Payload >250 bytes: bincode varint takes the 0xFB+u16 3-byte form."""
    rng = np.random.default_rng(5)
    d = str(tmp_path)
    sigs = rng.random((23, 96)).astype(np.float32)  # 384-byte payload
    _write_reference_dump(d, sigs, record_magic=True, record_len=True,
                          len_kind="varint")
    got = read_hnsw_data(os.path.join(d, "hnswdump.hnsw.data"),
                         n=23, dim=96, dtype=np.float32)
    np.testing.assert_array_equal(got, sigs)


def test_corrupted_dump_refuses_to_guess(tmp_path):
    """A file whose size decomposes but whose DataIds are NOT sequential
    must raise (refuse-to-guess contract), not return garbage."""
    rng = np.random.default_rng(6)
    d = str(tmp_path)
    sigs = rng.random((37, 48)).astype(np.float32)
    _write_reference_dump(d, sigs, record_magic=True, record_len=True)
    path = os.path.join(d, "hnswdump.hnsw.data")
    data = bytearray(open(path, "rb").read())
    # corrupt every record's DataId field (offset 4 within the record)
    stride = 4 + 8 + 8 + 48 * 4
    for i in range(37):
        data[i * stride + 4 : i * stride + 12] = struct.pack("<Q", 7_000_000 + i * 3)
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="refusing to guess"):
        read_hnsw_data(path, n=37, dim=48, dtype=np.float32)


def test_truncated_dump_raises(tmp_path):
    """A truncated dump must raise — either the size decomposition fails
    outright, or a coincidental decomposition exists but its DataIds are
    garbage and the reader refuses to guess."""
    rng = np.random.default_rng(7)
    d = str(tmp_path)
    sigs = rng.random((37, 48)).astype(np.float32)
    _write_reference_dump(d, sigs)
    path = os.path.join(d, "hnswdump.hnsw.data")
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-100])
    with pytest.raises(ValueError,
                       match="refusing to guess|does not decompose"):
        read_hnsw_data(path, n=37, dim=48, dtype=np.float32)


@pytest.mark.parametrize("t_name", ["f32", "u16", "u32", "u64", "f64"])
@pytest.mark.parametrize("len_pack", ["u64", "u32", "u8"])
def test_description_reader(tmp_path, t_name, len_pack):
    """t_name extraction across bincode framings (fixint u64/u32 length
    prefixes and the one-byte varint form)."""
    p = tmp_path / "hnswdump.hnsw.graph"
    p.write_bytes(_graph_description(t_name, n=100, dim=48,
                                     len_pack=len_pack))
    assert read_reference_description(str(p)) == t_name


def test_description_reader_garbage(tmp_path):
    p = tmp_path / "hnswdump.hnsw.graph"
    p.write_bytes(b"\x00" * 128)
    assert read_reference_description(str(p)) is None
    assert read_reference_description(str(tmp_path / "missing")) is None


def test_import_trusts_description_on_mismatch(tmp_path, caplog):
    """A dump whose description type contradicts parameters.json imports
    by the description (what hnsw_rs actually wrote): u64 PROB3A
    signatures under a parameters.json claiming k=16 (u32)."""
    rng = np.random.default_rng(8)
    ref = tmp_path / "refdb"
    out = tmp_path / "native"
    ref.mkdir()
    n, dim = 64, 32
    sigs = rng.integers(0, 1 << 60, (n, dim), dtype=np.uint64)
    _write_reference_dump(str(ref), sigs, algo="PROB3A", kmer=16)
    # parameters claim k=16 -> u32; the dump (data + description) is u64
    assert reference_sig_dtype(
        __import__("gsearch_tpu.core.params", fromlist=["ProcessingParams"])
        .ProcessingParams.reload_json(str(ref))) == np.uint32
    res = import_reference_db(str(ref), str(out))
    assert res["source_dtype"] == "uint64"
    index = load_index(str(out))
    d, ids = index.search(fold_u64_sigs(sigs[:5]), knbn=1)
    assert (ids[:, 0] == np.arange(5)).all()


def test_reference_sig_dtype():
    def pp(algo, k, data_t="DNA"):
        return ProcessingParams(
            hnsw=HnswParams(), block_flag=True,
            sketch=SeqSketcherParams(kmer_size=k, sketch_size=64, algo=algo,
                                     data_t=data_t))
    assert reference_sig_dtype(pp("OPTDENS", 21)) == np.float32
    assert reference_sig_dtype(pp("SUPER", 21)) == np.float32
    assert reference_sig_dtype(pp("HLL", 21)) == np.uint16
    assert reference_sig_dtype(pp("PROB3A", 16)) == np.uint32
    assert reference_sig_dtype(pp("PROB3A", 21)) == np.uint64
    assert reference_sig_dtype(pp("SUPER2", 7, "AA")) == np.uint64
    assert reference_sig_dtype(pp("SUPER2", 5, "AA")) == np.uint32


def test_fold_u64_preserves_equality():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 63, (20, 16), dtype=np.uint64)
    b = a.copy()
    b[:, ::2] = rng.integers(0, 1 << 63, (20, 8), dtype=np.uint64)
    fa, fb = fold_u64_sigs(a), fold_u64_sigs(b)
    assert fa.dtype == np.uint32
    # equal slots stay equal; the flipped slots (random) differ
    np.testing.assert_array_equal(fa[:, 1::2], fb[:, 1::2])
    assert (fa[:, ::2] != fb[:, ::2]).mean() > 0.99


def test_import_end_to_end(tmp_path):
    """Full import: reference dir -> native DB dir -> search finds the
    imported points (self-queries at distance 0)."""
    rng = np.random.default_rng(2)
    ref = tmp_path / "refdb"
    out = tmp_path / "native"
    ref.mkdir()
    n, dim = 200, 64
    sigs = (rng.random((n, dim)).astype(np.float32) * 8).round() / 8
    _write_reference_dump(str(ref), sigs)
    res = import_reference_db(str(ref), str(out))
    assert res["nb_points"] == n
    index = load_index(str(out))
    assert index.nb_points == n
    d, ids = index.search(sigs[:10], knbn=1)
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)


def test_import_u64_prob_db(tmp_path):
    """PROB3A k=21 reference DB stores u64 signatures; import folds to
    u32 while preserving the Hamming structure."""
    rng = np.random.default_rng(3)
    ref = tmp_path / "refdb"
    out = tmp_path / "native"
    ref.mkdir()
    n, dim = 100, 32
    sigs = rng.integers(0, 1 << 60, (n, dim), dtype=np.uint64)
    _write_reference_dump(str(ref), sigs, algo="PROB3A", kmer=21)
    res = import_reference_db(str(ref), str(out))
    assert res["source_dtype"] == "uint64"
    index = load_index(str(out))
    assert index.get_sigs().dtype == np.uint32
    d, ids = index.search(fold_u64_sigs(sigs[:5]), knbn=1)
    assert (ids[:, 0] == np.arange(5)).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)
