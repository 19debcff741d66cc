"""Sharded ANN graph index: D independent per-shard graphs searched as one.

The reference scales past one machine by OFFLINE sharding: split the genome
dir into N pieces, build N independent HNSW indexes, search each, merge
results by hand (reference: scripts/split_folder.sh, multiple_build.sh,
multiple_search.sh; README.md:402-413 — todo.md item 3 notes the N-piece
search is "algorithmically equal" to one big index).  Here that idea is a
first-class index kind:

* rows are assigned round-robin to D subgraphs (global id g lives in shard
  g % D at local row g // D — stable under incremental `add`),
* each shard is a normal HnswIndex built with the device-resident batch
  inserter (all shards share one compiled insert program since their
  capacities match),
* search runs every shard: on one chip sequentially, or — with a device
  mesh — as ONE shard_map dispatch where each device beam-searches its own
  subgraph, reranks its local candidates against its full signatures, and
  the per-shard top-k merges over ICI (parallel/mesh.py MeshGraphSearcher).

This removes the single-chip HBM ceiling of the one-graph index: the
signature matrix, search prefix and neighbor arrays all shard over the
mesh 'd' axis, so capacity scales linearly with chips while query latency
stays one traversal deep.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils import get_logger
from .hnsw import HnswIndex

log = get_logger(__name__)


class ShardedHnswIndex:
    KIND = "hnsw_sharded"

    def __init__(
        self,
        sketch_size: int,
        sig_dtype,
        n_shards: int,
        max_nb_conn: int = 64,
        ef_construction: int = 200,
        scale_modification: float = 1.0,
        search_prefix: int = 1024,
    ):
        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        self.sketch_size = sketch_size
        self.sig_dtype = np.dtype(sig_dtype)
        self.n_shards = int(n_shards)
        self.max_nb_conn = int(max_nb_conn)
        self.ef_construction = int(ef_construction)
        self.scale_modification = float(scale_modification)
        self.search_prefix = min(search_prefix, sketch_size)
        self.shards = [
            HnswIndex(
                sketch_size=sketch_size,
                sig_dtype=sig_dtype,
                max_nb_conn=max_nb_conn,
                ef_construction=ef_construction,
                scale_modification=scale_modification,
                search_prefix=search_prefix,
            )
            for _ in range(self.n_shards)
        ]
        self._mesh_searcher = None

    # ------------------------------------------------------------------ basics

    @property
    def nb_points(self) -> int:
        return sum(s.nb_points for s in self.shards)

    def get_nb_point(self) -> int:
        return self.nb_points

    def get_sigs(self) -> np.ndarray:
        """Signatures reassembled in GLOBAL id order (analysis paths and the
        exact MeshSearcher fallback both consume this layout)."""
        n = self.nb_points
        out = np.empty((n, self.sketch_size), self.sig_dtype)
        for i, sh in enumerate(self.shards):
            out[i :: self.n_shards] = sh.get_sigs()
        return out

    # ------------------------------------------------------------------ build

    def insert(self, sigs: np.ndarray, batch_size: int = 1024) -> None:
        """Append a batch; global ids continue from nb_points and spread
        round-robin so `add` keeps every shard balanced (|size_i - size_j|
        <= 1 always)."""
        sigs = np.ascontiguousarray(sigs, dtype=self.sig_dtype)
        if sigs.shape[0] == 0:
            return
        g = self.nb_points + np.arange(sigs.shape[0])
        for i in range(self.n_shards):
            part = sigs[(g % self.n_shards) == i]
            if part.shape[0]:
                self.shards[i].insert(part, batch_size=batch_size)
        self._mesh_searcher = None

    # ------------------------------------------------------------------ search

    def _to_global(self, shard: int, local_ids: np.ndarray) -> np.ndarray:
        return local_ids * self.n_shards + shard

    def search(
        self, queries: np.ndarray, knbn: int, ef_search: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-device path: search each subgraph in turn, merge top-k on
        host.  With a mesh, use parallel/mesh.MeshGraphSearcher instead —
        one dispatch, per-shard work on its own chip."""
        nq = queries.shape[0]
        if self.nb_points == 0:
            return np.full((nq, 0), np.inf, np.float32), np.zeros((nq, 0), np.int32)
        knbn = min(knbn, self.nb_points)
        all_d, all_g = [], []
        for i, sh in enumerate(self.shards):
            if sh.nb_points == 0:
                continue
            d, lids = sh.search(queries, min(knbn, sh.nb_points), ef_search)
            all_d.append(d)
            all_g.append(self._to_global(i, lids))
        d = np.concatenate(all_d, axis=1)
        gids = np.concatenate(all_g, axis=1)
        sel = np.argsort(d, axis=1, kind="stable")[:, :knbn]
        return (
            np.take_along_axis(d, sel, axis=1),
            np.take_along_axis(gids, sel, axis=1).astype(np.int32),
        )

    # ------------------------------------------------------------------ io

    def save_arrays(self, prefix: str) -> dict:
        for i, sh in enumerate(self.shards):
            sh.save_arrays(f"{prefix}.shard{i}")
        return {
            "n_shards": self.n_shards,
            "max_nb_conn": self.max_nb_conn,
            "ef_construction": self.ef_construction,
            "scale_modification": self.scale_modification,
            "search_prefix": self.search_prefix,
        }

    @classmethod
    def load_arrays(cls, prefix: str, meta: dict) -> "ShardedHnswIndex":
        n_shards = int(meta["n_shards"])
        shards = [
            HnswIndex.load_arrays(f"{prefix}.shard{i}", meta) for i in range(n_shards)
        ]
        idx = cls(
            sketch_size=shards[0].sketch_size,
            sig_dtype=shards[0].sig_dtype,
            n_shards=n_shards,
            max_nb_conn=int(meta.get("max_nb_conn", 64)),
            ef_construction=int(meta.get("ef_construction", 200)),
            scale_modification=float(meta.get("scale_modification", 1.0)),
            search_prefix=int(meta.get("search_prefix", 1024)),
        )
        idx.shards = shards
        return idx
