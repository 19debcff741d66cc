"""k-NN graph extraction + statistics from a database index.

Capability-equivalent of annembed's fromhnsw module as used by the
reference (`kgraph_from_hnsw_all(hnsw, knbn)`, KGraph stats, Hubness;
reference call sites: src/utils/embed.rs:19-33, src/bin/hnsw2knn.rs:101-171).

On TPU the extraction is one batched self-search of the database —
the graph falls out of the same fused distance + top-k path as requests.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class KGraph:
    neighbors: np.ndarray  # int32 [N, K]
    distances: np.ndarray  # f32 [N, K]

    @property
    def nb_nodes(self) -> int:
        return self.neighbors.shape[0]

    @property
    def knbn(self) -> int:
        return self.neighbors.shape[1]

    def get_out_edges_by_idx(self, i: int):
        return list(zip(self.neighbors[i], self.distances[i]))

    def stats(self) -> dict:
        """Quantile statistics on first-neighbor distances
        (reference: kgraph.get_kraph_stats, embed.rs:26)."""
        d1 = self.distances[:, 0]
        qs = [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
        return {
            "nb_nodes": self.nb_nodes,
            "knbn": self.knbn,
            "first_dist_quantiles": {str(q): float(np.quantile(d1, q)) for q in qs},
            "mean_first_dist": float(d1.mean()),
            "max_dist": float(self.distances.max()),
        }


class Hubness:
    """In-degree (hubness) statistics of the k-NN digraph
    (reference: annembed Hubness::{get_standard3m, get_hubness_histogram},
    embed.rs:28-33)."""

    def __init__(self, kgraph: KGraph):
        self.kgraph = kgraph
        self.in_degree = np.bincount(
            kgraph.neighbors.ravel(), minlength=kgraph.nb_nodes
        ).astype(np.float64)

    def get_standard3m(self) -> float:
        """Standardized third moment (skewness) of the in-degree
        distribution — the classic hubness measure."""
        d = self.in_degree
        mu = d.mean()
        sd = d.std()
        if sd == 0:
            return 0.0
        return float(((d - mu) ** 3).mean() / sd**3)

    def get_hubness_histogram(self, nb_bins: int = 20) -> np.ndarray:
        hist, _ = np.histogram(self.in_degree, bins=nb_bins)
        return hist


def kgraph_from_index(index, knbn: int = 8, ef_search: int = 0) -> KGraph:
    """Self-search the database: k-NN graph over its own points."""
    sigs = index.get_sigs()
    ef = ef_search or max(64, 2 * (knbn + 1))
    d, ids = index.search(sigs, knbn=knbn + 1, ef_search=ef)
    # drop self-matches (first column where id == row, else farthest)
    n = sigs.shape[0]
    rows = np.arange(n)
    out_ids = np.empty((n, knbn), dtype=np.int32)
    out_d = np.empty((n, knbn), dtype=np.float32)
    for i in rows:
        mask = ids[i] != i
        keep_ids = ids[i][mask][:knbn]
        keep_d = d[i][mask][:knbn]
        if len(keep_ids) < knbn:  # degenerate duplicates: pad with last
            pad = knbn - len(keep_ids)
            keep_ids = np.concatenate([keep_ids, keep_ids[-1:].repeat(pad)])
            keep_d = np.concatenate([keep_d, keep_d[-1:].repeat(pad)])
        out_ids[i] = keep_ids
        out_d[i] = keep_d
    return KGraph(neighbors=out_ids, distances=out_d)
