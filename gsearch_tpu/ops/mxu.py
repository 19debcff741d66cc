"""MXU-based sketch search: slot equality as an int8 matmul.

The exact equal-count distance (ops/distance.py) is VPU-bound: Q*N*S
compares.  The MXU cannot compare, but it can do something statistically
equivalent: expand every slot value into m sign bits of a *hash* of the
value.  For two genomes' slots:

    equal slot   -> all m sign bits agree        -> contributes +m
    unequal slot -> hash bits are iid fair coins -> contributes 0 on average

so  E[ q_exp . d_exp ] = m * S * J  with per-pair noise sd ~ sqrt(mS)/2 —
an unbiased Jaccard estimator whose precision grows with m, computed as a
[Q, mS] x [mS, N] int8 matmul at MXU rate (hundreds of TOPS) instead of a
VPU compare sweep.  Hashing the value first makes the coin-flip property
hold for ANY signature dtype (f32 hash values, u32 fingerprints, u16
SetSketch registers whose neighboring levels differ in one low bit).

Search = matmul scores -> top-C candidates -> exact equal-count rerank on
the gathered candidate rows -> top-k.  With C a few times k the end-to-end
ranking matches the exact kernel with probability -> 1 (validated in
tests/test_mxu.py); rerank distances are bit-exact.

Reference role: this replaces hnsw_rs::parallel_search as the throughput
path (reference: src/dna/dnarequest.rs:353) — the graph index (hnsw.py)
remains for corpora too large for a full sweep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hash import mix32

_EXPAND_SEED = 0x51614B17

# budget for the pallas rerank's scalar-prefetched [Q, C] int32 candidate
# operand; SMEM is 1 MB/core, leave headroom for other scalar operands
_MAX_SMEM_CAND_BYTES = 768 * 1024


def _as_u32(sigs: jnp.ndarray) -> jnp.ndarray:
    if sigs.dtype == jnp.float32:
        return sigs.view(jnp.uint32)
    if sigs.dtype != jnp.uint32:
        return sigs.astype(jnp.uint32)
    return sigs


@functools.partial(jax.jit, static_argnames=("m",))
def expand_signs(sigs: jnp.ndarray, m: int = 4) -> jnp.ndarray:
    """[N, S] any-dtype signatures -> [N, m*S] int8 in {-1, +1}."""
    h = mix32(_as_u32(sigs), _EXPAND_SEED)
    shifts = jnp.arange(m, dtype=jnp.uint32)
    bits = (h[..., None] >> shifts) & jnp.uint32(1)  # [N, S, m]
    signs = (bits.astype(jnp.int8) << 1) - jnp.int8(1)
    return signs.reshape(sigs.shape[0], sigs.shape[1] * m)


def expand_signs_chunked(sigs: np.ndarray, m: int = 4, chunk: int = 8192) -> jax.Array:
    """Host->device expansion in row chunks to bound peak memory."""
    outs = []
    for start in range(0, sigs.shape[0], chunk):
        outs.append(expand_signs(jnp.asarray(sigs[start : start + chunk]), m=m))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("m", "spad"))
def _init_write(db_exp, full3, rows_u32, start, *, m, spad):
    """Expand one row chunk and write it into the preallocated device
    buffers IN PLACE (donated): concatenating per-chunk results doubles
    peak HBM (a 65k x 12000 database is ~7.2 GB across the two
    representations — the concat copies OOM next to resident signatures)."""
    exp = expand_signs(rows_u32, m=m)
    f3 = _pad_reshape_full(rows_u32, spad=spad)
    db_exp = jax.lax.dynamic_update_slice(db_exp, exp, (start, jnp.int32(0)))
    full3 = jax.lax.dynamic_update_slice(
        full3, f3, (start, jnp.int32(0), jnp.int32(0)))
    return db_exp, full3


@functools.partial(jax.jit, static_argnames=("spad",))
def _pad_reshape_full(rows_u32: jnp.ndarray, *, spad: int) -> jnp.ndarray:
    """[R, S] u32 -> [R, 8, spad/8] with zero column pads (rerank layout)."""
    r, s = rows_u32.shape
    if spad > s:
        rows_u32 = jnp.concatenate(
            [rows_u32, jnp.zeros((r, spad - s), jnp.uint32)], axis=1)
    return rows_u32.reshape(r, 8, spad // 8)


@functools.partial(jax.jit, static_argnames=("nb_cand", "approx"))
def _mxu_candidates(q_exp: jnp.ndarray, db_exp: jnp.ndarray, nb_cand: int,
                    approx: bool = False):
    scores = jax.lax.dot_general(
        q_exp,
        db_exp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Q, N]
    # top_k over int32 is pathologically slow on TPU; scores are bounded by
    # m*S < 2^24 so the f32 conversion is lossless
    scores = scores.astype(jnp.float32)
    if approx:
        # TPU-native bucketed top-k: 3.8 ms vs 21 ms for exact top_k at
        # [1024, 65536].  The exact rerank downstream corrects ordering,
        # and the caller widens nb_cand (see _search_batched) so the true
        # top-k sit far from the approx boundary where the misses live.
        # The barrier keeps the matmul/convert from fusing into the
        # ApproxTopK input: fused, the compiler fails with "Wasn't able
        # to find a valid iteration window" (standalone it compiles at
        # every candidate width we use).
        scores = jax.lax.optimization_barrier(scores)
        _, cand = jax.lax.approx_max_k(
            scores, nb_cand, recall_target=0.95, aggregate_to_topk=True)
    else:
        _, cand = jax.lax.top_k(scores, nb_cand)
    return cand


@functools.partial(jax.jit, static_argnames=("knbn", "s_true", "use_pallas"))
def _rerank(q_sigs: jnp.ndarray, db_full3: jnp.ndarray, cand: jnp.ndarray,
            n_valid: jnp.ndarray, knbn: int, s_true: int, use_pallas: bool = False):
    """Exact equal-count distances on the candidate rows, then top-k.

    db_full3 is the column-padded signature matrix pre-shaped [N, 8, Sp/8]
    (db col pads 0).  On TPU candidate rows come through the pallas
    row-DMA gather kernel: an XLA gather materializes all Q*C rows as one
    HLO temp (13 GB at Q=4096, C=72, S=12000 — compile OOM), the kernel
    streams them through a VMEM scratch instead."""
    qs = _as_u32(q_sigs)
    sp = db_full3.shape[1] * db_full3.shape[2]
    if sp > qs.shape[1]:  # query col pads 1: never equal to the db's 0
        q_pad = jnp.concatenate(
            [qs, jnp.ones((qs.shape[0], sp - qs.shape[1]), jnp.uint32)], axis=1)
    else:
        q_pad = qs
    if use_pallas:
        from .distance import gather_hamming_pallas

        d = gather_hamming_pallas(db_full3, q_pad, cand, s_true=s_true)
    else:
        flat = db_full3.reshape(db_full3.shape[0], sp)
        rows = jnp.take(flat, cand, axis=0)  # [Q, C, Sp]
        eq = (rows == q_pad[:, None, :]).sum(axis=-1).astype(jnp.float32)
        d = 1.0 - eq / jnp.float32(s_true)
    d = jnp.where(cand < n_valid, d, jnp.inf)
    neg, sel = jax.lax.top_k(-d, knbn)
    return -neg, jnp.take_along_axis(cand, sel, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("m", "nb_cand", "knbn", "s_true", "use_pallas", "approx"))
def _search_fused(q_sigs, db_exp, db_full3, n_valid, *, m, nb_cand, knbn,
                  s_true, use_pallas=False, approx=False):
    """One-dispatch search: expand + matmul candidates + exact rerank.

    A single jit keeps the whole pipeline on device per call — in
    relay/remote setups each extra dispatch costs a network round trip."""
    q_exp = expand_signs(q_sigs, m=m)
    cand = _mxu_candidates(q_exp, db_exp, nb_cand, approx)
    return _rerank(q_sigs, db_full3, cand, n_valid, knbn, s_true, use_pallas)


class MxuSearcher:
    """Holds the expanded database on device; searches in two stages."""

    def __init__(self, sigs: np.ndarray, m: int = 4, rerank_factor: int = 8,
                 approx: bool | None = None):
        self.m = m
        self.s = sigs.shape[1]
        self.n = sigs.shape[0]
        self.rerank_factor = rerank_factor
        # pad N so every database size in a power-of-two bucket shares one
        # compiled program (remote compiles are expensive here)
        nb = 16
        while nb < self.n:
            nb <<= 1
        pad = nb - self.n
        on_device = isinstance(sigs, jax.Array) and not isinstance(sigs, np.ndarray)
        spad = ((self.s + 1023) // 1024) * 1024
        if on_device:
            # device-resident signatures (e.g. straight from the on-device
            # sketcher): derive both representations with zero host hops.
            # Chunked like the host path: one-shot expansion materializes
            # [N, S, m] u32 temps (11.7 GB at 65k x 12000 — HBM OOM).
            if pad:
                sigs = jnp.concatenate(
                    [sigs, jnp.zeros((pad,) + sigs.shape[1:], sigs.dtype)], 0)
            u = (sigs.view(jnp.uint32) if sigs.dtype == jnp.float32
                 else sigs.astype(jnp.uint32))
            chunks = (u[start : start + 8192] for start in range(0, nb, 8192))
        else:
            # ONE host->device pass: upload u32 row chunks and derive both
            # device-resident representations from them.  Uploading the raw
            # signatures twice doubled init time in relay/remote setups.
            if pad:
                sigs = np.concatenate(
                    [sigs, np.zeros((pad,) + sigs.shape[1:], sigs.dtype)], 0)
            u = (sigs.view(np.uint32) if sigs.dtype == np.float32
                 else sigs.astype(np.uint32))
            chunks = (jnp.asarray(np.ascontiguousarray(u[start : start + 8192]))
                      for start in range(0, nb, 8192))
        if nb <= 8192:
            rows = next(chunks)
            self._db_exp = expand_signs(rows, m=m)
            self._full3 = _pad_reshape_full(rows, spad=spad)
            self._finish_init(approx)
            return
        # preallocate the two device buffers and fill them with donated
        # in-place writes (see _init_write)
        db_exp = jnp.zeros((nb, self.s * m), jnp.int8)
        full3 = jnp.zeros((nb, 8, spad // 8), jnp.uint32)
        for start, rows in zip(range(0, nb, 8192), chunks):
            db_exp, full3 = _init_write(
                db_exp, full3, rows, jnp.int32(start), m=m, spad=spad)
        self._db_exp = db_exp
        self._full3 = full3
        self._finish_init(approx)

    def _finish_init(self, approx):
        self._use_pallas = jax.default_backend() == "tpu"
        # approx_max_k candidate selection: default ON for big TPU
        # databases (at [1024, 65536] it is 3.8 ms vs 21 ms for exact
        # top_k; recall_target 0.95 at the widened candidate count keeps
        # measured end-to-end recall@10 at 1.0 because the exact rerank
        # re-scores a candidate list much wider than k).  approx=False
        # forces exact selection (the recall oracle).
        if approx is None:
            approx = self._use_pallas and self.n >= 32768
        self._approx = bool(approx)

    def search(self, queries, knbn: int) -> Tuple[np.ndarray, np.ndarray]:
        """queries: [Q, S] numpy OR device array (jax.Array) — serving paths
        keep freshly-sketched queries on device and skip the host hop."""
        nq = queries.shape[0]
        qb = 8
        while qb < nq:
            qb <<= 1
        if qb != nq:
            pad = qb - nq
            if isinstance(queries, np.ndarray):
                queries = np.concatenate(
                    [queries, np.zeros((pad,) + queries.shape[1:], queries.dtype)], 0
                )
            else:
                queries = jnp.concatenate(
                    [queries, jnp.zeros((pad,) + queries.shape[1:], queries.dtype)], 0
                )
        q_dev = jnp.asarray(queries)
        knbn = min(knbn, self.n)
        d, ids = self._search_batched(q_dev, knbn, jnp)
        return np.asarray(d)[:nq], np.asarray(ids)[:nq]

    def search_device(self, q_dev: jax.Array, knbn: int):
        """Fully device-resident variant: returns device arrays (no fetch)."""
        knbn = min(knbn, self.n)
        return self._search_batched(q_dev, knbn, jnp)

    def _search_batched(self, q_dev, knbn, xp):
        """Dispatch _search_fused in query chunks sized so the pallas
        rerank's scalar-prefetched candidate operand [Qc, C] int32 fits
        SMEM (1 MB/core; e.g. Q=4096 x C=72 x 4 B = 1.18 MB overflows)."""
        nb_cand = min(max(self.rerank_factor * knbn, 64), self._full3.shape[0])
        if self._approx:
            # widen the rerank list so approx_max_k's boundary misses stay
            # clear of the true top-k (rerank DMA is bandwidth-bound and
            # cheap relative to the 17 ms exact-top_k saving)
            nb_cand = min(max(nb_cand + knbn * 4, 96), self._full3.shape[0])
        qb = q_dev.shape[0]
        # the SMEM allocation lane-pads the [Q, C] i32 operand to C->128k
        cand_row_bytes = ((nb_cand + 127) // 128) * 128 * 4
        chunk = 8
        while chunk * 2 * cand_row_bytes <= _MAX_SMEM_CAND_BYTES and chunk < qb:
            chunk <<= 1
        if chunk >= qb:
            return _search_fused(
                q_dev, self._db_exp, self._full3, jnp.int32(self.n),
                m=self.m, nb_cand=nb_cand, knbn=knbn, s_true=self.s,
                use_pallas=self._use_pallas, approx=self._approx,
            )
        ds, ids = [], []
        for start in range(0, qb, chunk):
            rows = q_dev[start : start + chunk]
            if rows.shape[0] != chunk:  # keep one compiled program
                rows = jnp.concatenate(
                    [rows, jnp.zeros((chunk - rows.shape[0],) + rows.shape[1:],
                                     rows.dtype)], 0)
            d, i = _search_fused(
                rows, self._db_exp, self._full3, jnp.int32(self.n),
                m=self.m, nb_cand=nb_cand, knbn=knbn, s_true=self.s,
                use_pallas=self._use_pallas, approx=self._approx,
            )
            ds.append(d)
            ids.append(i)
        return (xp.concatenate(ds, axis=0)[:qb], xp.concatenate(ids, axis=0)[:qb])
