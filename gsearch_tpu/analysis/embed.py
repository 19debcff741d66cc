"""UMAP-like 2-D embedding of a sketch database — the `ann` subcommand.

Capability-equivalent of annembed's Embedder as driven by the reference
(reference: src/utils/embed.rs:14-77 — EmbedderParams{nb_grad_batch=15,
scale_rho=0.75, beta=1, grad_step=3, nb_sampling_by_edge=10,
dmap_init=true}, output `database_embedded.csv`, quality estimate from
edge lengths; CLI dispatch src/bin/gsearch.rs:784-852).

TPU-first formulation: annembed runs asynchronous SGD over edges with
negative sampling; here each "grad batch" is a *full-batch* fused update —
attractive forces from all k-NN edges and repulsive forces from
nb_sampling_by_edge fresh uniform negatives per edge, accumulated with
segment-sums.  That is an embarrassingly parallel gather/scatter-add over
[N*K] edges per step — exactly the shape a VPU wants, and it needs no
BLAS feature gate (the reference only compiles `ann` with one,
src/utils/mod.rs:10-11).

Init follows the dmap_init spirit: a few power iterations of the
symmetric-normalized affinity matrix give diffusion-map-like coordinates.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..utils import get_logger
from .kgraph import Hubness, KGraph, kgraph_from_index

log = get_logger(__name__)


@dataclasses.dataclass
class EmbedderParams:
    """(reference defaults at embed.rs:40-47)"""

    nb_grad_batch: int = 15
    scale_rho: float = 0.75
    beta: float = 1.0
    grad_step: float = 3.0
    nb_sampling_by_edge: int = 10
    dmap_init: bool = True
    dim: int = 2


class Embedder:
    def __init__(self, kgraph: KGraph, params: EmbedderParams | None = None, seed: int = 0):
        self.kgraph = kgraph
        self.params = params or EmbedderParams()
        self.seed = seed
        self._embedded: np.ndarray | None = None

    # -- affinity weights (UMAP-style local scaling) --------------------------

    def _edge_weights(self) -> np.ndarray:
        d = self.kgraph.distances.astype(np.float64)
        rho = d.min(axis=1, keepdims=True)
        scale = np.maximum((d - rho).mean(axis=1, keepdims=True) * self.params.scale_rho, 1e-9)
        w = np.exp(-np.maximum(d - rho, 0.0) / scale)
        return w.astype(np.float32)

    def _dmap_init(self, w: np.ndarray) -> np.ndarray:
        """Diffusion-map-flavored init: power iterations of the normalized
        affinity, orthogonalized, as starting coordinates."""
        n, k = self.kgraph.neighbors.shape
        rng = np.random.default_rng(self.seed)
        y = rng.normal(size=(n, self.params.dim)).astype(np.float32)
        deg = np.maximum(w.sum(axis=1), 1e-9)
        for _ in range(12):
            # y <- D^-1 (W y) over the sparse k-NN edges
            msg = (w[:, :, None] * y[self.kgraph.neighbors]).sum(axis=1)
            y = msg / deg[:, None]
            y = y - y.mean(axis=0, keepdims=True)
            # orthogonalize to stop collapse onto the lead eigenvector
            qy, _ = np.linalg.qr(y)
            y = qy.astype(np.float32)
        # scale to a sane extent
        return (y / max(np.abs(y).max(), 1e-9) * 10.0).astype(np.float32)

    # -- optimization ----------------------------------------------------------

    def embed(self) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        p = self.params
        nbrs = self.kgraph.neighbors.astype(np.int32)
        w = self._edge_weights()
        n, k = nbrs.shape
        src = np.repeat(np.arange(n, dtype=np.int32), k)
        dst = nbrs.ravel()
        ew = w.ravel()

        y0 = self._dmap_init(w) if p.dmap_init else (
            np.random.default_rng(self.seed).normal(size=(n, p.dim)).astype(np.float32) * 10
        )

        src_j = jnp.asarray(src)
        dst_j = jnp.asarray(dst)
        ew_j = jnp.asarray(ew)
        beta = jnp.float32(p.beta)

        def step(y, key):
            yi = y[src_j]
            yj = y[dst_j]
            diff = yi - yj
            d2 = (diff * diff).sum(-1, keepdims=True)
            # attraction: UMAP gradient with a=b=1 generalized by beta
            attr = (-2.0 * beta * ew_j[:, None]) * diff / (1.0 + d2)
            g = jnp.zeros_like(y).at[src_j].add(attr)
            g = g.at[dst_j].add(-attr)
            # repulsion: fresh uniform negatives per edge per sampling round
            def neg_round(gacc, kk):
                negs = jax.random.randint(kk, (src_j.shape[0],), 0, n)
                yn = y[negs]
                diffn = yi - yn
                dn2 = (diffn * diffn).sum(-1, keepdims=True)
                rep = (2.0 / p.nb_sampling_by_edge) * diffn / ((0.1 + dn2) * (1.0 + dn2))
                gacc = gacc.at[src_j].add(rep)
                return gacc, None
            keys = jax.random.split(key, p.nb_sampling_by_edge)
            g, _ = jax.lax.scan(neg_round, g, keys)
            lr = jnp.float32(p.grad_step / max(k, 1))
            y = y + lr * g
            return y, None

        y = jnp.asarray(y0)
        keys = jax.random.split(jax.random.PRNGKey(self.seed), p.nb_grad_batch)
        y, _ = jax.jit(lambda y, ks: jax.lax.scan(step, y, ks))(y, keys)
        self._embedded = np.asarray(y)
        return self._embedded

    def get_embedded_reindexed(self) -> np.ndarray:
        assert self._embedded is not None
        return self._embedded

    def get_quality_estimate_from_edge_length(self, nb_sample: int = 200) -> float:
        """Mean embedded-length of graph edges over mean length of random
        pairs — small is good (reference: embed.rs:69-70)."""
        assert self._embedded is not None
        y = self._embedded
        rng = np.random.default_rng(1)
        e_len = np.linalg.norm(
            y[self.kgraph.neighbors[:, 0]] - y, axis=1
        ).mean()
        a = rng.integers(0, len(y), nb_sample)
        b = rng.integers(0, len(y), nb_sample)
        r_len = np.linalg.norm(y[a] - y[b], axis=1).mean()
        return float(e_len / max(r_len, 1e-12))


def get_graph_stats_embed(
    db_dir: str,
    ask_stats: bool = True,
    embed: bool = False,
    knbn: int = 8,
    params: EmbedderParams | None = None,
    out_dir: str = ".",
) -> dict:
    """The `ann` workflow (reference: SURVEY.md §3.4)."""
    from ..index.serialize import load_index

    index = load_index(db_dir)
    kgraph = kgraph_from_index(index, knbn=knbn)
    stats = kgraph.stats()
    hub = Hubness(kgraph)
    s3m = hub.get_standard3m()
    hist = hub.get_hubness_histogram()
    summary = (
        f"kgraph: {stats['nb_nodes']} nodes, knbn={knbn}; "
        f"first-dist median {stats['first_dist_quantiles']['0.5']:.4f}; "
        f"hubness (standard 3rd moment): {s3m:.3e}"
    )
    result = {"stats": stats, "hubness_s3m": s3m, "hubness_hist": hist.tolist(), "summary": summary}
    if embed:
        embedder = Embedder(kgraph, params)
        y = embedder.embed()
        csv_path = os.path.join(out_dir, "database_embedded.csv")
        np.savetxt(csv_path, y, delimiter=",", fmt="%.6e")
        q = embedder.get_quality_estimate_from_edge_length(200)
        result["embedded_csv"] = csv_path
        result["quality"] = q
        result["summary"] += f"; embedded -> {csv_path} (quality {q:.3f})"
    return result
