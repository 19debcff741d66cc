"""Sparse seed-and-chain ANI — the skani role ("superani" tool).

Capability-equivalent of the reference's superani binary, which drives a
skani fork (fastx_to_sketches -> chain_seeds -> ANI + aligned fractions;
reference: binaux/src/bin/superani.rs:39-147 with c=30, k=16, marker
m=1000).  skani estimates ANI from the identity rate of *chained* spaced
k-mer seeds, robust to rearrangement and incomplete assemblies, and
reports the aligned fraction of query and reference.

TPU-native formulation:
  * seeds: canonical k-mers thinned to ~1/c by a hash threshold (the same
    fused window/hash kernel as every sketcher; positions kept),
  * matching: seed hash sets of the two genomes joined by sorted merge,
  * chaining: matched anchors vote into diagonal bands (qpos - rpos); runs
    of consistent diagonals form chains, mirroring skani's collinear
    chaining at band granularity.  ANI follows the Mash/Poisson inversion
    of the per-chain seed identity rate, and AF_q/AF_r are the chained
    span fractions.

The learned regression correction of skani (regression::predict_from_ani_res)
is intentionally not reproduced; the raw seed-identity ANI is reported.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import block_length
from ..ops.hash import mix2
from ..ops.kmer import canonical_dna_windows

_SEED = 0x5CA41
_BAND = 2048  # diagonal band width (bases)


@dataclasses.dataclass
class SeedSketch:
    hashes: np.ndarray     # sorted uint32 (unique)
    positions: np.ndarray  # position of first occurrence of each hash
    length: int            # genome length in bases
    c: int                 # spacing (1 seed per ~c bases)


class SeedChainer:
    def __init__(self, k: int = 16, c: int = 30, seed: int = _SEED):
        self.k = k
        self.c = c
        self.seed = seed
        self._threshold = np.uint32(int(2**32 // c))

    def _seed_fn(self, nb: int):
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        if nb in self._fn_cache:
            return self._fn_cache[nb]
        def run(codes: jnp.ndarray):
            hi, lo, valid = canonical_dna_windows(codes, self.k)
            h = mix2(hi, lo, self.seed)
            keep = valid & (h < jnp.uint32(self._threshold))
            return jnp.where(keep, h, jnp.uint32(0xFFFFFFFF))

        self._fn_cache[nb] = jax.jit(run)
        return self._fn_cache[nb]

    def sketch(self, codes: np.ndarray) -> SeedSketch:
        n = len(codes)
        hs, ps = [], []
        max_block = 1 << 22
        step = max_block - (self.k - 1)
        for start in range(0, max(n, 1), step):
            piece = codes[start : start + max_block]
            nb = block_length(len(piece))
            if len(piece) < nb:
                piece = np.pad(piece, (0, nb - len(piece)), constant_values=255)
            h = np.asarray(self._seed_fn(nb)(jnp.asarray(piece)))
            sel = np.nonzero(h != 0xFFFFFFFF)[0]
            hs.append(h[sel])
            ps.append(sel + start)
        h = np.concatenate(hs) if hs else np.empty(0, np.uint32)
        p = np.concatenate(ps) if ps else np.empty(0, np.int64)
        # unique seeds only (repeats are ambiguous anchors; skani filters too)
        uh, idx, counts = np.unique(h, return_index=True, return_counts=True)
        keep = counts == 1
        return SeedSketch(hashes=uh[keep], positions=p[idx[keep]], length=n, c=self.c)

    def compare(self, q: SeedSketch, r: SeedSketch) -> Tuple[float, float, float]:
        """Returns (ani_percent, af_query, af_ref)."""
        if len(q.hashes) == 0 or len(r.hashes) == 0:
            return 0.0, 0.0, 0.0
        # sorted-merge join of the seed sets
        common, qi, ri = np.intersect1d(q.hashes, r.hashes, assume_unique=True,
                                        return_indices=True)
        if len(common) < 5:
            return 0.0, 0.0, 0.0
        qp = q.positions[qi].astype(np.int64)
        rp = r.positions[ri].astype(np.int64)
        # diagonal-band chaining: anchors voting for the same diagonal band
        # belong to one collinear chain
        diag = (qp - rp) // _BAND
        bands, votes = np.unique(diag, return_counts=True)
        # keep bands with enough support (>= 2 anchors and >= 2% of matches)
        good = (votes >= 2) & (votes >= 0.02 * votes.max())
        good_bands = set(bands[good].tolist())
        in_chain = np.array([d in good_bands for d in diag.tolist()])
        if in_chain.sum() < 5:
            return 0.0, 0.0, 0.0
        qp_c, rp_c = qp[in_chain], rp[in_chain]
        # chained span on each sequence (union of per-band spans)
        span_q = 0
        span_r = 0
        for b in good_bands:
            m = diag[in_chain] == b
            if m.sum() < 2:
                continue
            span_q += int(qp_c[m].max() - qp_c[m].min()) + self.c
            span_r += int(rp_c[m].max() - rp_c[m].min()) + self.c
        af_q = min(1.0, span_q / max(q.length, 1))
        af_r = min(1.0, span_r / max(r.length, 1))
        # seed identity rate within the chained region: matched seeds over
        # the seeds the query has in that span
        n_match = int(in_chain.sum())
        exp_seeds_q = max(span_q, 1) / q.c
        ident = min(1.0, n_match / max(exp_seeds_q, 1.0))
        # Mash/Poisson inversion of k-mer survival (README.md:110-117)
        ani = 100.0 * (1.0 + np.log(max(ident, 1e-12)) / self.k)
        return float(max(ani, 0.0)), af_q, af_r
