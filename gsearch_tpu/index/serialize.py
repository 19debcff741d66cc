"""Index persistence: the framework's checkpoint system.

Role parity with the reference's dump/reload suite (reference:
src/utils/dumpload.rs:15-62 `dumpall`, src/utils/reloadhnsw.rs:13-51 —
dumps are self-describing: the stored metadata names the signature scalar
type and index kind so reloaders can dispatch without CLI flags, exactly
like the reference's dump-description-driven reload).

A database directory contains:
    parameters.json          (core/params.py)
    seqdict.json             (core/seqdict.py)
    processing_state.json    (core/state.py)
    index.meta.json          {kind, sig_dtype, nb_points, sketch_size, ...}
    index.sigs.npy           signature matrix [N, S]
    index.graph.npz          (hnsw only) per-layer neighbor arrays
"""

from __future__ import annotations

import json
import os

import numpy as np

INDEX_META_FILE = "index.meta.json"
INDEX_PREFIX = "index"


def dump_index(index, dirpath: str) -> None:
    prefix = os.path.join(dirpath, INDEX_PREFIX)
    extra = index.save_arrays(prefix)
    meta = {
        "kind": index.KIND,
        "sig_dtype": np.dtype(index.sig_dtype).name,
        "nb_points": index.nb_points,
        "sketch_size": index.sketch_size,
    }
    meta.update(extra or {})
    with open(os.path.join(dirpath, INDEX_META_FILE), "w") as f:
        json.dump(meta, f)


def get_index_kind(dirpath: str) -> dict:
    """Read the self-describing metadata (the analog of
    reloadhnsw.rs:13-37 get_hnsw_type)."""
    with open(os.path.join(dirpath, INDEX_META_FILE)) as f:
        return json.load(f)


def load_index(dirpath: str):
    from .flat import FlatIndex
    from .hnsw import HnswIndex
    from .sharded import ShardedHnswIndex

    meta = get_index_kind(dirpath)
    prefix = os.path.join(dirpath, INDEX_PREFIX)
    kinds = {"flat": FlatIndex, "hnsw": HnswIndex,
             "hnsw_sharded": ShardedHnswIndex}
    cls = kinds[meta["kind"]]
    return cls.load_arrays(prefix, meta)


def dumpall(dirpath: str, index, seqdict, params, state=None) -> None:
    """One-stop database dump (reference: dumpload.rs:15-62)."""
    os.makedirs(dirpath, exist_ok=True)
    dump_index(index, dirpath)
    seqdict.dump(dirpath)
    params.dump_json(dirpath)
    if state is not None:
        state.dump_json(dirpath)
