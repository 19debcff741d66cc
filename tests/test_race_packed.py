"""Packed scatter race vs the reference bucket_min."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsearch_tpu.ops.race import _PR_WINDOW, bucket_min, bucket_min_packed


def test_packed_matches_reference_winners(rng):
    n, s = 4096, 300
    slots = rng.integers(0, s, size=(2, n)).astype(np.int32)
    keys = rng.integers(0, 2**32, size=(2, n), dtype=np.uint32)
    valid = rng.random((2, n)) > 0.1
    ref = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s, valid=jnp.asarray(valid))
    got = bucket_min_packed(jnp.asarray(slots), jnp.asarray(keys), s, valid=jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(ref.found), np.asarray(got.found))
    f = np.asarray(ref.found)
    slot_bits = max(1, s.bit_length())
    hi_mask = np.uint32(0xFFFFFFFF) << slot_bits
    rk = np.asarray(ref.key) & hi_mask
    gk = np.asarray(got.key) & hi_mask
    # winners agree on the key bits the packed word keeps
    mismatches = int((rk[f] != gk[f]).sum())
    assert mismatches == 0, f"{mismatches} mismatching winners"
    # packed word's low bits are the slot id
    got_slots = np.asarray(got.key) & np.uint32((1 << slot_bits) - 1)
    assert (got_slots[f] == np.nonzero(f)[1]).all()


def test_packed_prereduce_path(rng):
    """Shapes that trigger the windowed pre-reduction still find the exact
    per-slot winners (up to the documented ~1e-4 loss bound)."""
    n, s = 1 << 16, 512  # n/2/s = 64 >= 40 -> pre-reduce active
    assert (n // 2) / s >= 40 and n % _PR_WINDOW == 0
    slots = rng.integers(0, s, size=(1, n)).astype(np.int32)
    keys = rng.integers(0, 2**32, size=(1, n), dtype=np.uint32)
    ref = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s)
    got = bucket_min_packed(jnp.asarray(slots), jnp.asarray(keys), s)
    f = np.asarray(ref.found)
    slot_bits = max(1, s.bit_length())
    hi_mask = np.uint32(0xFFFFFFFF) << slot_bits
    rk = np.asarray(ref.key) & hi_mask
    gk = np.asarray(got.key) & hi_mask
    agree = (rk[f] == gk[f]).mean()
    assert agree >= 0.9995, f"winner agreement {agree}"


def test_packed_optdens_cross_genome_consistency(rng):
    """Packed-race optdens sketches remain deterministic and estimate the
    same Jaccard as the generic-race path."""
    from gsearch_tpu.core.params import SeqSketcherParams
    from gsearch_tpu.io.codec import encode_dna
    from gsearch_tpu.models.optdens import OptDensSketcher

    from conftest import mutate_dna, random_dna

    seq_a = random_dna(rng, 30_000)
    seq_b = mutate_dna(rng, seq_a, 0.02)
    params = SeqSketcherParams(kmer_size=12, sketch_size=512, algo="OPTDENS", data_t="DNA")
    fast = OptDensSketcher(params)
    slow = OptDensSketcher(params)
    slow.USE_PACKED_RACE = False

    sa_f = fast.sketch_codes(encode_dna(seq_a))
    sa_f2 = fast.sketch_codes(encode_dna(seq_a))
    np.testing.assert_array_equal(sa_f, sa_f2)  # deterministic

    sb_f = fast.sketch_codes(encode_dna(seq_b))
    sa_s = slow.sketch_codes(encode_dna(seq_a))
    sb_s = slow.sketch_codes(encode_dna(seq_b))
    j_fast = float((sa_f == sb_f).mean())
    j_slow = float((sa_s == sb_s).mean())
    assert abs(j_fast - j_slow) < 0.04, f"fast {j_fast} vs slow {j_slow}"
