"""Packed single-key race vs the reference bucket_min."""

import jax.numpy as jnp
import numpy as np

from gsearch_tpu.ops.race import bucket_min, bucket_min_packed


def test_packed_matches_reference(rng):
    n, s = 4000, 300
    slots = rng.integers(0, s, size=(2, n)).astype(np.int32)
    keys = rng.integers(0, 2**32, size=(2, n), dtype=np.uint32)
    valid = rng.random((2, n)) > 0.1
    ref = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s, valid=jnp.asarray(valid))
    got = bucket_min_packed(jnp.asarray(slots), jnp.asarray(keys), s, valid=jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(ref.found), np.asarray(got.found))
    f = np.asarray(ref.found)
    rk = np.asarray(ref.key)
    gk = np.asarray(got.key)
    # winners agree except where two darts tie on the top (32 - slot_bits)
    # key bits — with full-range random keys that is ~2^-23 here
    mismatches = (rk[f] != gk[f]).sum()
    assert mismatches == 0, f"{mismatches} mismatching winners"


def test_packed_optdens_equals_unpacked_sketch(rng):
    """The optdens sketch via the packed race matches the generic race."""
    from gsearch_tpu.core.params import SeqSketcherParams
    from gsearch_tpu.io.codec import encode_dna
    from gsearch_tpu.models.optdens import OptDensSketcher

    from conftest import random_dna

    seq = random_dna(rng, 20_000)
    params = SeqSketcherParams(kmer_size=12, sketch_size=1024, algo="OPTDENS", data_t="DNA")
    fast = OptDensSketcher(params)
    slow = OptDensSketcher(params)
    slow.USE_PACKED_RACE = False
    sig_fast = fast.sketch_codes(encode_dna(seq))
    sig_slow = slow.sketch_codes(encode_dna(seq))
    agree = (sig_fast == sig_slow).mean()
    # identical up to top-bit ties in the packed comparison
    assert agree > 0.999, f"agreement {agree}"
