"""ProbMinHash — weighted (probability) Jaccard sketching.

Capability-equivalent of the reference's ProbHash3aSketch (reference:
src/dna/dnasketch.rs:499-519, README.md:122-127; algorithm family: Ertl,
"ProbMinHash — A Class of Locality-Sensitive Hash Algorithms for the
(Probability) Jaccard Similarity", arXiv 1911.00675).  Signature slot s is
the element winning an exponential race with rates proportional to the
element's k-mer multiplicity; two genomes agree on slot s with probability
J_P, the probability Jaccard of their weighted k-mer spectra.

TPU formulation (the CPU algorithm's hash-table of counts + per-element
heap does not map to a vector unit):

 1. One batched sort of the k-mer stream groups equal k-mers; the
    occurrence rank of each position inside its run falls out of a single
    cumulative max — no hash table, no counting pass.
 2. An element with multiplicity m is the superposition of m unit-rate
    arrival processes; occurrence o (= rank) carries process (x, o).  Two
    genomes with multiplicities mA < mB share exactly the first mA
    processes — precisely the coupling that makes the race estimate J_P.
    The per-genome normalization by total weight W is a uniform time scale
    and cannot change any argmin, so it is dropped entirely.
 3. Each occurrence emits C=2 arrivals of its Poisson process
    (times Gamma_j = e_0 + ... + e_j of Exp(1) increments, slots uniform),
    and everything funnels into the same `bucket_min` race as every other
    sketcher.  Truncation error is O((S/W)^3) per occurrence — far below
    the sketch's own sampling noise for any real genome.

The signature is a 32-bit fingerprint of the winning element (the reference
stores the u32/u64 winning k-mer value; 32 bits keep slot-collision
probability at 2^-32, invisible next to 1/sqrt(S) sketch noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash import exp_from_bits, mix2, mix32
from ..ops.race import RaceResult
from .base import SketcherBase

_RANK_SEED = 0xA11CE5
_SLOT_SEED = 0xB0B5EED
_PAY_SEED = 0xCAFEF00D
_SENTINEL = jnp.uint32(0xFFFFFFFF)
_ARRIVALS = 2


class ProbMinHashSketcher(SketcherBase):
    SIG_DTYPE = np.uint32

    arrivals: int = _ARRIVALS

    def _darts(self, hi, lo, valid):
        # 1. group equal k-mers by sorting (invalid windows to the far end)
        khi = jnp.where(valid, hi, _SENTINEL)
        klo = jnp.where(valid, lo, _SENTINEL)
        s_hi, s_lo = jax.lax.sort((khi, klo), dimension=-1, num_keys=2)
        s_valid = ~((s_hi == _SENTINEL) & (s_lo == _SENTINEL))

        # 2. occurrence rank within each equal-k-mer run via cummax
        n = s_hi.shape[-1]
        iota = jnp.arange(n, dtype=jnp.int32)
        prev_hi = jnp.concatenate([_SENTINEL[None], s_hi[:-1]])
        prev_lo = jnp.concatenate([_SENTINEL[None], s_lo[:-1]])
        is_start = (s_hi != prev_hi) | (s_lo != prev_lo)
        run_start = jax.lax.cummax(jnp.where(is_start, iota, 0), axis=0)
        rank = (iota - run_start).astype(jnp.uint32)

        # 3. C arrivals per occurrence process (x, rank)
        slots_l, keys_l, valid_l = [], [], []
        t = jnp.zeros(s_hi.shape, dtype=jnp.float32)
        for j in range(self.arrivals):
            sub_seed = mix32(rank * jnp.uint32(self.arrivals) + jnp.uint32(j), self.seed ^ _RANK_SEED)
            t = t + exp_from_bits(mix2(s_hi, s_lo, sub_seed))
            slot = mix2(s_hi, s_lo, sub_seed ^ jnp.uint32(_SLOT_SEED)) % jnp.uint32(self.nb_slots)
            slots_l.append(slot.astype(jnp.int32))
            keys_l.append(t.view(jnp.uint32))  # positive f32 bits sort correctly
            valid_l.append(s_valid)
        payload = mix2(s_hi, s_lo, self.seed ^ _PAY_SEED)

        slots = jnp.concatenate(slots_l, axis=-1)
        keys = jnp.concatenate(keys_l, axis=-1)
        dvalid = jnp.concatenate(valid_l, axis=-1)
        pays = jnp.concatenate([payload] * self.arrivals, axis=-1)
        return slots, keys, pays, dvalid

    def _finalize_race(self, race: RaceResult) -> jnp.ndarray:
        idx = jnp.arange(self.nb_slots, dtype=jnp.uint32)
        filler = mix32(idx, self.seed ^ 0xD00DF00D)
        return jnp.where(race.found, race.payload, filler)
