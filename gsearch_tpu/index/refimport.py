"""Import a reference-format (Rust gsearch) database directory.

The reference's primary distribution channel is pre-built databases
(/root/reference/gsearch_database.txt): a directory holding

  hnswdump.hnsw.data    hnsw_rs point dump — per-point signature vectors
                        tagged with their DataId (= SeqDict rank)
  hnswdump.hnsw.graph   hnsw_rs layer/link dump (not needed: the graph is
                        rebuilt on-device by HnswIndex._build_bulk, which
                        is faster than downloading it)
  seqdict.json          streamed concatenated ItemDict records
                        {"id":{"path","fasta_id"},"len"} (idsketch.rs:164-253)
  parameters.json       ProcessingParams (parameters.rs:178-218; field
                        names are serde defaults, shared with our schema)
  processing_state.json ProcessingState (files.rs:22-111)

This module reads the signature matrix + metadata and materializes a
native five-file database (index/serialize.py), so a user holding the
published RefSeq/GTDB dumps does not re-download and re-sketch anything
(reference dump writer: src/utils/dumpload.rs:15-62, reader:
src/utils/reloadhnsw.rs:13-51).

The hnsw_rs binary record layout is not normative here (the crate is an
external dependency), so the reader detects it: it solves
file_size == header + n * (overhead + payload) over a small grid of
plausible (header, overhead) pairs and validates the candidate by
checking that each record's embedded u64 DataId runs 0..n-1 — gsearch
inserts points with their SeqDict rank as the id (idsketch.rs:14-16), so
a correct parse yields exactly the identity sequence, which a wrong
stride cannot produce by accident.
"""

from __future__ import annotations

import json
import os
import struct
from typing import List, Optional, Tuple

import numpy as np

from ..core.params import DataType, ProcessingParams, SketchAlgo
from ..core.seqdict import Id, ItemDict, SeqDict
from ..utils import get_logger

log = get_logger(__name__)


def reference_sig_dtype(params: ProcessingParams) -> np.dtype:
    """The reference's signature scalar for (algo, kmer_size, data_t) —
    the element type stored in hnswdump.hnsw.data (dispatch:
    src/dna/dnasketch.rs:493-644, src/aa/aasketch.rs:449-552)."""
    algo = params.sketch.algo
    k = params.sketch.kmer_size
    wide_k = 6 if params.sketch.data_t == DataType.AA else 16
    if algo in (SketchAlgo.SUPER, SketchAlgo.OPTDENS, SketchAlgo.REVOPTDENS):
        return np.dtype(np.float32)
    if algo == SketchAlgo.HLL:
        return np.dtype(np.uint16)
    # PROB3A / SUPER2: the signature carries kmer hash values, whose width
    # follows the compressed kmer type (u32 up to wide_k, u64 beyond)
    return np.dtype(np.uint64 if k > wide_k else np.uint32)


#: scalar type names hnsw_rs dumps carry in their graph-file description
#: (the set the reference dispatches on: src/bin/gsearch.rs:784-852,
#: binaux/src/bin/hnswcore.rs:432-462)
_T_NAMES = {"u16": np.uint16, "u32": np.uint32, "u64": np.uint64,
            "f32": np.float32, "f64": np.float64,
            "i32": np.int32, "i64": np.int64}


def read_reference_description(graph_path: str) -> Optional[str]:
    """Extract the scalar type name from an hnsw_rs graph-dump description
    header, or None if it cannot be identified.

    The reference reloads databases by reading this description first and
    dispatching on its `t_name` field (src/utils/reloadhnsw.rs:13-37,
    src/bin/gsearch.rs:784-807).  hnsw_rs serializes the Description
    struct with bincode: its final two fields are the distance name and
    the scalar type name, each a length-prefixed string.  Rather than
    hard-coding one bincode version's framing, scan the header region for
    a known distance-name string followed by a length-prefixed known type
    name — both vocabularies are tiny and fixed, so a match is
    unambiguous; anything else returns None and the caller falls back to
    parameters.json (which fully determines the type for gsearch-written
    databases, reference_sig_dtype above)."""
    try:
        with open(graph_path, "rb") as f:
            head = f.read(512)
    except OSError:
        return None
    dist_pos = -1
    for dn in (b"DistHamming", b"DistL2", b"DistL1", b"DistCosine",
               b"DistJaccard", b"DistLevenshtein"):
        p = head.find(dn)
        if p >= 0:
            dist_pos = p + len(dn)
            break
    if dist_pos < 0:
        return None
    window = head[dist_pos : dist_pos + 32]
    for name in _T_NAMES:
        nb = name.encode()
        p = window.find(nb)
        if p < 0:
            continue
        # require a plausible length prefix immediately before the string:
        # u64/u32 little-endian == len(name), or a bincode-2 varint byte
        pre = window[:p]
        ln = len(nb)
        if (pre.endswith(struct.pack("<Q", ln))
                or pre.endswith(struct.pack("<I", ln))
                or pre.endswith(struct.pack("<B", ln))):
            return name
    return None


def read_reference_seqdict(path: str) -> SeqDict:
    """Read seqdict.json in the reference's streamed form (concatenated
    top-level objects, idsketch.rs:164-186) or our array form."""
    with open(path, "r") as f:
        text = f.read()
    stripped = text.lstrip()
    sd = SeqDict()
    if stripped.startswith("["):
        for d in json.loads(stripped):
            sd.push(ItemDict.from_json(d))
        return sd
    dec = json.JSONDecoder()
    pos, end = 0, len(text)
    while True:
        while pos < end and text[pos].isspace():
            pos += 1
        if pos >= end:
            break
        obj, pos = dec.raw_decode(text, pos)
        if "id" in obj:  # reference nested form
            sd.push(ItemDict(
                id=Id(path=obj["id"]["path"], fasta_id=obj["id"]["fasta_id"]),
                len=int(obj["len"]),
            ))
        else:  # flat form
            sd.push(ItemDict.from_json(obj))
    return sd


def _candidate_layouts(file_size: int, n: int, payload: int):
    """Yield (header, overhead) pairs consistent with the file size.

    overhead covers any per-record magic/id/length prefix.  Because the
    payload length is CONSTANT across records, even variable-width length
    encodings (bincode 2 varints: 1 byte under 251, 0xFB+u16, 0xFC+u32,
    0xFD+u64) produce the same prefix bytes every record — i.e. a fixed
    stride — so exhausting every (header, overhead) in [0, 32] covers
    fixed u32/u64 framing AND varint framing (e.g. magic4 + id8 + varint5
    = overhead 17).  The file-size decomposition plus the rank-sequential
    DataId check (_validate_ids) then selects the real layout or refuses."""
    for header in range(0, 33):
        for overhead in range(0, 33):
            if header + n * (overhead + payload) == file_size:
                yield header, overhead


def _validate_ids(mm: np.memmap, header: int, overhead: int, payload: int,
                  n: int) -> Optional[int]:
    """If some u64 field inside the per-record overhead equals the record
    rank for every sampled record, return its offset within the record;
    else None."""
    if overhead < 8:
        return None
    stride = overhead + payload
    sample = np.unique(np.concatenate([
        np.arange(min(n, 64)),
        np.linspace(0, n - 1, num=min(n, 64)).astype(np.int64),
    ]))
    for id_off in range(0, overhead - 7):
        ok = True
        for r in sample:
            base = header + int(r) * stride + id_off
            got = int(np.frombuffer(mm[base : base + 8].tobytes(), "<u8")[0])
            if got != int(r):
                ok = False
                break
        if ok:
            return id_off
    return None


def read_hnsw_data(path: str, n: int, dim: int, dtype: np.dtype,
                   ) -> np.ndarray:
    """Parse hnswdump.hnsw.data into a [n, dim] signature matrix."""
    dtype = np.dtype(dtype)
    payload = dim * dtype.itemsize
    file_size = os.path.getsize(path)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    choices: List[Tuple[int, int, Optional[int]]] = []
    for header, overhead in _candidate_layouts(file_size, n, payload):
        id_off = _validate_ids(mm, header, overhead, payload, n)
        choices.append((header, overhead, id_off))
    if not choices:
        raise ValueError(
            f"{path}: size {file_size} does not decompose as "
            f"header + {n} * (overhead + {payload}); wrong n/dim/dtype "
            f"(n from seqdict.json, dim/dtype from parameters.json)?")
    # prefer a layout whose embedded DataIds validate; among those, the
    # smallest overhead (ids directly precede the payload in hnsw_rs dumps)
    with_ids = [c for c in choices if c[2] is not None]
    if with_ids:
        header, overhead, id_off = min(with_ids, key=lambda c: c[1])
    elif len(choices) == 1 and choices[0][1] == 0:
        header, overhead, id_off = choices[0]  # bare matrix (no per-record tag)
    else:
        raise ValueError(
            f"{path}: no candidate record layout contains rank-sequential "
            f"DataIds (tried {choices}); refusing to guess")
    log.info("hnsw data layout: header=%d overhead=%d id_offset=%s",
             header, overhead, id_off)
    stride = overhead + payload
    out = np.empty((n, dim), dtype=dtype)
    rows = mm[header : header + n * stride].reshape(n, stride)
    out[:] = rows[:, overhead:].view(dtype).reshape(n, dim)
    return out


def fold_u64_sigs(sigs: np.ndarray) -> np.ndarray:
    """u64 signatures -> u32 by xor-folding halves.  DistHamming only
    tests slot equality (anndists DistHamming as used at
    src/dna/dnarequest.rs:353): equal u64 slots stay equal, unequal slots
    collide with probability 2^-32 — distance change is negligible while
    every index/search kernel keeps its 32-bit layout."""
    u = sigs.view(np.uint32).reshape(sigs.shape[0], sigs.shape[1], 2)
    return (u[:, :, 0] ^ u[:, :, 1]).astype(np.uint32)


def import_reference_db(ref_dir: str, out_dir: str, index_kind: str = "auto",
                        ) -> dict:
    """Convert a reference database directory into a native one.

    Reads signatures + metadata, rebuilds the ANN graph on-device
    (HnswIndex bulk constructor — minutes at 262k, reference build hours),
    and writes the five-file native DB to out_dir.  Returns a summary dict."""
    from ..index.serialize import dumpall
    from ..pipeline import _new_index

    params = ProcessingParams.reload_json(ref_dir)
    sd_path = os.path.join(ref_dir, "seqdict.json")
    seqdict = read_reference_seqdict(sd_path)
    n = len(seqdict)
    dim = params.sketch.sketch_size
    dtype = reference_sig_dtype(params)
    # cross-check against the dump's own description (the reference's
    # reload dispatches on this t_name, reloadhnsw.rs:13-37); on mismatch
    # trust the dump — it records what hnsw_rs actually wrote
    t_name = read_reference_description(
        os.path.join(ref_dir, "hnswdump.hnsw.graph"))
    if t_name is not None:
        desc_dtype = np.dtype(_T_NAMES[t_name])
        if desc_dtype != dtype:
            log.warning(
                "graph description says %s but parameters.json implies %s; "
                "using the description", t_name, dtype.name)
            dtype = desc_dtype
    data_path = os.path.join(ref_dir, "hnswdump.hnsw.data")
    log.info("importing %d signatures [%d x %d %s] from %s",
             n, n, dim, dtype.name, data_path)
    sigs = read_hnsw_data(data_path, n, dim, dtype)
    if dtype == np.uint64:
        sigs = fold_u64_sigs(sigs)
    index = _new_index(params, sigs.dtype, index_kind, nb_hint=n)
    index.insert(sigs)
    os.makedirs(out_dir, exist_ok=True)
    dumpall(out_dir, index, seqdict, params)
    log.info("imported %d points -> %s (%s index)", n, out_dir, index.KIND)
    return {"nb_points": n, "sketch_size": dim, "source_dtype": dtype.name,
            "index_kind": index.KIND, "out": out_dir}
