"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding tests run on virtual CPU devices (the analog of the
reference ecosystem's 'multi-node without a cluster' testing); real-TPU
benchmarking lives in bench.py, not here.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np
import pytest

# This machine may ship an `.axon_site` sitecustomize that registers a
# remote-TPU PJRT plugin at interpreter startup, pinning the platform before
# any env var or config takes effect.  Tests want a LOCAL 8-device virtual
# CPU mesh, so force it by resetting the backends in-process.
if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    import jax.extend.backend

    jax.config.update("jax_platforms", "cpu")
    jax.extend.backend.clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

# XLA compiles are shipped to a remote compile service in this environment
# (seconds to minutes each); the persistent cache makes re-runs fast.
os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same stream whether it runs solo
    # or in the full suite (a shared session stream made statistical
    # thresholds depend on which tests ran before)
    return np.random.default_rng(42)


def random_dna(rng, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))


def mutate_dna(rng, seq: bytes, rate: float) -> bytes:
    """Point-mutate a fraction `rate` of positions."""
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    n_mut = int(len(arr) * rate)
    pos = rng.choice(len(arr), size=n_mut, replace=False)
    arr[pos] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_mut)
    return arr.tobytes()


def exact_canonical_kmer_set(seq: bytes, k: int) -> set:
    """Brute-force canonical k-mer set (oracle)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    s = seq.decode()
    out = set()
    for i in range(len(s) - k + 1):
        km = s[i : i + k]
        if any(c not in "ACGT" for c in km):
            continue
        rc = "".join(comp[c] for c in reversed(km))
        out.add(min(km, rc))
    return out


def exact_jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
