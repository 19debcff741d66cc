import jax.numpy as jnp
import numpy as np

from gsearch_tpu.ops.race import bucket_min, combine_race, empty_race


def _oracle(slots, keys, pays, valid, s):
    best = {}
    for sl, k, p, v in zip(slots, keys, pays, valid):
        if not v or sl >= s:
            continue
        cur = best.get(sl)
        if cur is None or (k, p) < cur:
            best[sl] = (k, p)
    return best


def test_bucket_min_vs_oracle(rng):
    n, s = 500, 37
    slots = rng.integers(0, s, size=n).astype(np.int32)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    pays = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    valid = rng.random(n) > 0.2
    res = bucket_min(
        jnp.asarray(slots), jnp.asarray(keys), s, payload=jnp.asarray(pays), valid=jnp.asarray(valid)
    )
    oracle = _oracle(slots, keys, pays, valid, s)
    found = np.asarray(res.found)
    key = np.asarray(res.key)
    pay = np.asarray(res.payload)
    for slot in range(s):
        if slot in oracle:
            assert found[slot]
            assert (int(key[slot]), int(pay[slot])) == oracle[slot]
        else:
            assert not found[slot]


def test_bucket_min_batched(rng):
    b, n, s = 3, 200, 16
    slots = rng.integers(0, s, size=(b, n)).astype(np.int32)
    keys = rng.integers(0, 2**32, size=(b, n), dtype=np.uint32)
    res = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s)
    for i in range(b):
        oracle = _oracle(slots[i], keys[i], keys[i], np.ones(n, bool), s)
        for slot in range(s):
            assert bool(res.found[i, slot]) == (slot in oracle)
            if slot in oracle:
                assert int(res.key[i, slot]) == oracle[slot][0]


def test_combine_equals_joint(rng):
    """Racing two halves then combining == racing the concatenation."""
    n, s = 300, 25
    slots = rng.integers(0, s, size=n).astype(np.int32)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    pays = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    joint = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s, payload=jnp.asarray(pays))
    a = bucket_min(jnp.asarray(slots[:150]), jnp.asarray(keys[:150]), s, payload=jnp.asarray(pays[:150]))
    b = bucket_min(jnp.asarray(slots[150:]), jnp.asarray(keys[150:]), s, payload=jnp.asarray(pays[150:]))
    merged = combine_race(a, b)
    np.testing.assert_array_equal(np.asarray(joint.found), np.asarray(merged.found))
    f = np.asarray(joint.found)
    np.testing.assert_array_equal(np.asarray(joint.key)[f], np.asarray(merged.key)[f])
    np.testing.assert_array_equal(np.asarray(joint.payload)[f], np.asarray(merged.payload)[f])


def test_empty_race_identity(rng):
    n, s = 100, 10
    slots = rng.integers(0, s, size=n).astype(np.int32)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    r = bucket_min(jnp.asarray(slots), jnp.asarray(keys), s)
    e = empty_race((), s)
    m = combine_race(e, r)
    np.testing.assert_array_equal(np.asarray(r.found), np.asarray(m.found))
    f = np.asarray(r.found)
    np.testing.assert_array_equal(np.asarray(r.key)[f], np.asarray(m.key)[f])
