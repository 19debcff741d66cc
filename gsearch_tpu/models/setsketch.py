"""SetSketch ("HLL" mode) — u16 register sketches.

Capability-equivalent of the reference's HyperLogLogSketch, which is Ertl's
SetSketch with m = sketch_size and u16 registers (reference:
src/dna/dnasketch.rs:541-574 — `SetSketchParams::default()` + `set_m`;
algorithm: Ertl, "SetSketch: Filling the Gap between MinHash and
HyperLogLog", arXiv 2101.00314).

A SetSketch register is a log-discretized per-slot minimum of the same
unit-rate exponential arrival race used by the other sketchers here: slot s
holds r_s = clamp(floor(OFFSET - ln(t_s)/ln(b)), 0, 65535) where t_s is the
minimal arrival time.  Registers therefore encode both cardinality (their
level) and identity (which element arrived first), and the reference
compares them with plain DistHamming slot equality — as do we.

Base b = 1.001 gives ~45k distinguishable levels across the u16 range,
comfortably covering genome cardinalities from viruses to metagenomes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.hash import exp_from_bits, mix2
from ..ops.race import RaceResult
from .base import SketcherBase

_SLOT_SEED = 0x5E75EED
_TIME_SEED = 0x7113D
_ARRIVALS = 2

_LOG_B = float(np.log(1.001))
_OFFSET = 20000.0


class SetSketchSketcher(SketcherBase):
    SIG_DTYPE = np.uint16

    arrivals: int = _ARRIVALS

    def _darts(self, hi, lo, valid):
        slots_l, keys_l, valid_l = [], [], []
        t = jnp.zeros(hi.shape, dtype=jnp.float32)
        for j in range(self.arrivals):
            t = t + exp_from_bits(mix2(hi, lo, (self.seed ^ _TIME_SEED ^ (j * 0x9E3779B9)) & 0xFFFFFFFF))
            slot = mix2(hi, lo, (self.seed ^ _SLOT_SEED ^ (j * 0x85EBCA6B)) & 0xFFFFFFFF) % jnp.uint32(self.nb_slots)
            slots_l.append(slot.astype(jnp.int32))
            keys_l.append(t.view(jnp.uint32))
            valid_l.append(valid)
        slots = jnp.concatenate(slots_l, axis=-1)
        keys = jnp.concatenate(keys_l, axis=-1)
        dvalid = jnp.concatenate(valid_l, axis=-1)
        return slots, keys, None, dvalid

    def _finalize_race(self, race: RaceResult) -> jnp.ndarray:
        t = race.key.view(jnp.float32)
        t = jnp.maximum(t, jnp.float32(1e-30))  # guard log(0)
        level = jnp.floor(jnp.float32(_OFFSET) - jnp.log(t) / jnp.float32(_LOG_B))
        level = jnp.clip(level, 0.0, 65535.0)
        # empty slots register 0 (the SetSketch/HLL "zero register")
        return jnp.where(race.found, level, 0.0).astype(jnp.uint16)
