"""Host-side sequence codecs: ASCII FASTA bytes -> small integer codes.

Capability-equivalent of the reference's 2-bit DNA `Sequence` /
5-bit AA `SequenceAA` codecs from kmerutils
(reference call sites: src/dna/dnafiles.rs:70-72 `encode_and_add` with
`Alphabet2b` dropping non-ACGT; src/aa/aafiles.rs:11-28 `filter_out_non_aa`).

TPU-facing layout choice: we encode to one uint8 code per symbol
(DNA: 0..3, AA: 0..19) rather than bit-packing on the host.  The device
kernels consume code arrays directly and fold them into compressed k-mer
words on-chip (gsearch_tpu/ops/kmer.py), so host bit-packing would only
save PCIe bytes at the cost of an unpack kernel; a packed variant can be
added behind the same interface if ingest bandwidth ever dominates.

Encoding is a single vectorized numpy table lookup (~1 GB/s), the analog of
the reference's per-byte alphabet loop.  Invalid symbols (N, ambiguity
codes, separators) become DNA_INVALID and act as hard k-mer breaks on
device — slightly stricter than the reference, which silently drops
non-ACGT bytes and therefore creates artificial junction k-mers.
"""

from __future__ import annotations

import numpy as np

DNA_INVALID = np.uint8(255)

# DNA: A=0 C=1 G=2 T=3 so that complement(x) == 3 - x == ~x & 3
_DNA_TABLE = np.full(256, DNA_INVALID, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _DNA_TABLE[ord(_c)] = _i
    _DNA_TABLE[ord(_c.lower())] = _i
_DNA_TABLE[ord("U")] = 3  # RNA
_DNA_TABLE[ord("u")] = 3

# AA: the 20 standard residues, 5-bit codes like the reference's SequenceAA
AA_ALPHABET = "ACDEFGHIKLMNPQRSTVWY"
_AA_TABLE = np.full(256, DNA_INVALID, dtype=np.uint8)
for _i, _c in enumerate(AA_ALPHABET):
    _AA_TABLE[ord(_c)] = _i
    _AA_TABLE[ord(_c.lower())] = _i

_DNA_DECODE = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_dna(seq_bytes: bytes | np.ndarray) -> np.ndarray:
    """ASCII DNA -> uint8 codes in {0..3} with 255 for invalid symbols."""
    arr = np.frombuffer(seq_bytes, dtype=np.uint8) if isinstance(seq_bytes, (bytes, bytearray)) else seq_bytes
    return _DNA_TABLE[arr]


def encode_aa(seq_bytes: bytes | np.ndarray) -> np.ndarray:
    """ASCII protein -> uint8 codes in {0..19} with 255 for invalid symbols."""
    arr = np.frombuffer(seq_bytes, dtype=np.uint8) if isinstance(seq_bytes, (bytes, bytearray)) else seq_bytes
    return _AA_TABLE[arr]


def decode_dna(codes: np.ndarray) -> bytes:
    """uint8 codes -> ASCII (invalid codes decode to 'N'); for tests/tools."""
    out = np.full(codes.shape, ord("N"), dtype=np.uint8)
    valid = codes < 4
    out[valid] = _DNA_DECODE[codes[valid]]
    return out.tobytes()
