import jax.numpy as jnp
import numpy as np
import pytest

from gsearch_tpu.io.codec import encode_dna
from gsearch_tpu.ops.kmer import canonical_dna_windows, kmer_windows, reverse_complement

from conftest import random_dna

pytestmark = pytest.mark.smoke

_COMP = {0: 3, 1: 2, 2: 1, 3: 0}


def _kmer_value(codes, i, k, bits):
    v = 0
    for j in range(k):
        v = (v << bits) | int(codes[i + j])
    return v


def _revcomp_value(codes, i, k):
    v = 0
    for j in reversed(range(k)):
        v = (v << 2) | _COMP[int(codes[i + j])]
    return v


@pytest.mark.parametrize("k", [4, 14, 16, 17, 21, 31, 32])
def test_kmer_windows_vs_bruteforce(rng, k):
    seq = random_dna(rng, 100)
    codes = encode_dna(seq)
    hi, lo, valid = kmer_windows(jnp.asarray(codes), k, 2)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    n = len(codes)
    for i in range(n):
        if i + k <= n:
            expect = _kmer_value(codes, i, k, 2)
            assert valid[i]
            got = (int(hi[i]) << 32) | int(lo[i])
            assert got == expect, f"pos {i}"
        else:
            assert not valid[i]


@pytest.mark.parametrize("k", [3, 16, 21, 32])
def test_reverse_complement(rng, k):
    seq = random_dna(rng, 64)
    codes = encode_dna(seq)
    hi, lo, valid = kmer_windows(jnp.asarray(codes), k, 2)
    rhi, rlo = reverse_complement(hi, lo, k)
    rhi, rlo = np.asarray(rhi), np.asarray(rlo)
    for i in range(len(codes) - k + 1):
        expect = _revcomp_value(codes, i, k)
        got = (int(rhi[i]) << 32) | int(rlo[i])
        assert got == expect, f"pos {i}"


def test_canonical_symmetry(rng):
    """canonical(seq) == canonical(revcomp(seq)) as multisets."""
    k = 11
    seq = random_dna(rng, 200)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rc = seq.translate(comp)[::-1]
    c1 = encode_dna(seq)
    c2 = encode_dna(rc)
    h1, l1, v1 = canonical_dna_windows(jnp.asarray(c1), k)
    h2, l2, v2 = canonical_dna_windows(jnp.asarray(c2), k)
    s1 = sorted(
        (int(h) << 32) | int(l) for h, l, v in zip(np.asarray(h1), np.asarray(l1), np.asarray(v1)) if v
    )
    s2 = sorted(
        (int(h) << 32) | int(l) for h, l, v in zip(np.asarray(h2), np.asarray(l2), np.asarray(v2)) if v
    )
    assert s1 == s2


def test_invalid_breaks_kmers():
    codes = encode_dna(b"ACGTNACGT")
    hi, lo, valid = kmer_windows(jnp.asarray(codes), 4, 2)
    valid = np.asarray(valid)
    # windows 0 and 5 are the only fully-valid 4-mers... window 1..4 cross N
    assert valid[0]
    assert not valid[1] and not valid[2] and not valid[3] and not valid[4]
    assert valid[5]


@pytest.mark.parametrize("k", [3, 6, 7, 12])
def test_aa_kmers(rng, k):
    from gsearch_tpu.io.codec import encode_aa

    seq = bytes(rng.choice(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8), size=50))
    codes = encode_aa(seq)
    hi, lo, valid = kmer_windows(jnp.asarray(codes), k, 5)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    for i in range(len(codes) - k + 1):
        expect = _kmer_value(codes, i, k, 5)
        got = (int(hi[i]) << 32) | int(lo[i])
        assert valid[i]
        assert got == expect
