"""Prokaryotic gene prediction — the FragGeneScan role, TPU-native.

Capability-equivalent of FragGeneScanRs as shipped with the reference
(reference: binaux/src/bin/FragGeneScanRs.rs:26-272 — HMM/Viterbi gene
calls over genomes/reads producing .faa/.ffn/.gff/.out, used to generate
the proteomes that AA mode consumes, README.md:533-560).

Model: a 7-state, 3-periodic codon HMM
    0: noncoding
    1..3: coding forward, codon positions 1..3
    4..6: coding reverse-complement, codon positions 1..3
with full-codon emissions attached to the third codon position (a 64-entry
log-usage table — in-frame stop codons get a hard floor, which is what
keeps genes open), and position-dependent transition bonuses for start
codons (ATG/GTG/TTG at nc->M1 / reverse stops for the minus strand) and
stop codons (M3->nc).  This is a first-order rendering of FragGeneScan's
model family: the reference's trained dicodon tables can be dropped in by
replacing the 64-entry usage table with a 4096-entry dicodon one (planned).

TPU formulation: emissions and bonuses for all positions are precomputed
as vectorized table lookups; the Viterbi recursion is a `lax.scan` over
positions carrying a [batch, 7] DP vector and emitting int8 backpointers;
backtrace is a second reverse `lax.scan`.  Everything is batched over
contigs/reads; no per-position Python.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import get_logger

log = get_logger(__name__)

NSTATE = 7
NC, F1, F2, F3, R1, R2, R3 = range(7)

# standard bacterial code
_CODON_AA = {}
_BASES = "TCAG"
_AA_TABLE = (
    "FFLLSSSSYY**CC*W"
    "LLLLPPPPHHQQRRRR"
    "IIIMTTTTNNKKSSRR"
    "VVVVAAAADDEEGGGG"
)
for _i, _b1 in enumerate(_BASES):
    for _j, _b2 in enumerate(_BASES):
        for _k, _b3 in enumerate(_BASES):
            _CODON_AA[_b1 + _b2 + _b3] = _AA_TABLE[16 * _i + 4 * _j + _k]

_STOPS = ("TAA", "TAG", "TGA")
_STARTS = ("ATG", "GTG", "TTG")

# codes are A=0 C=1 G=2 T=3 (io/codec.py); codon id = b0*16 + b1*4 + b2
_CODE_BASE = "ACGT"


def _codon_id(codon: str) -> int:
    return (
        _CODE_BASE.index(codon[0]) * 16
        + _CODE_BASE.index(codon[1]) * 4
        + _CODE_BASE.index(codon[2])
    )


def default_codon_logusage() -> np.ndarray:
    """Built-in 64-entry codon log-usage (E. coli-flavored bias: uniform
    over sense codons with stops floored).  Replaceable via GenePredParams."""
    usage = np.full(64, 1.0 / 61.0, dtype=np.float64)
    for s in _STOPS:
        usage[_codon_id(s)] = 1e-7
    return np.log(usage).astype(np.float32)


@dataclasses.dataclass
class GenePredParams:
    codon_logusage: np.ndarray = dataclasses.field(default_factory=default_codon_logusage)
    p_gene_start: float = 1.0 / 400.0     # nc -> gene rate per strand
    start_codon_bonus: float = 3.0        # extra for ATG/GTG/TTG at gene start
    stop_codon_bonus: float = 6.0         # extra for a proper stop at gene end
    min_gene_len: int = 90                # nt, reference default ORF floor
    whole_genes_only: bool = True         # -w 1 equivalent


@dataclasses.dataclass
class Gene:
    start: int      # 0-based, inclusive
    end: int        # exclusive
    strand: str     # '+' or '-'
    nt: str
    aa: str


def _precompute_scores(codes: jnp.ndarray, p: GenePredParams):
    """codes [B, L] -> per-position emissions [B, L, 7] and bonuses."""
    b, l = codes.shape
    c = jnp.where(codes < 4, codes, 0).astype(jnp.int32)
    invalid = codes >= 4
    # codon ending at position i (needs i >= 2)
    c1 = jnp.roll(c, 2, axis=1)
    c2 = jnp.roll(c, 1, axis=1)
    codon = c1 * 16 + c2 * 4 + c  # [B, L]
    # jnp.roll wraps around: the first two positions have no complete codon
    # and the wrap would fabricate one from the sequence tail
    pos = jnp.arange(l)[None, :]
    codon_bad = (
        invalid | jnp.roll(invalid, 1, axis=1) | jnp.roll(invalid, 2, axis=1) | (pos < 2)
    )
    # reverse-strand codon ending at i (gene on minus strand read right-to-left):
    # minus-strand codon occupying (i-2, i-1, i) is revcomp(c[i-2..i])
    rc = 3 - c
    rcodon = rc * 16 + (3 - c2) * 4 + (3 - c1)

    usage = jnp.asarray(p.codon_logusage)
    neg_big = jnp.float32(-1e9)

    # emissions: nc pays log(1/4) per base; coding pays the full codon
    # log-usage at the third codon position (M1/M2 emit 0), so one codon of
    # coding ~ log P(codon) competes with 3*log(1/4) of noncoding.
    e = jnp.zeros((b, l, NSTATE), dtype=jnp.float32)
    e = e.at[:, :, NC].set(jnp.where(invalid, neg_big, jnp.float32(np.log(0.25))))
    zero_or_inval = jnp.where(invalid, neg_big, jnp.float32(0.0))
    for st in (F1, F2, R1, R2):
        e = e.at[:, :, st].set(zero_or_inval)
    m3 = jnp.where(codon_bad, neg_big, jnp.take(usage, codon))
    r3 = jnp.where(codon_bad, neg_big, jnp.take(usage, rcodon))
    e = e.at[:, :, F3].set(m3)
    e = e.at[:, :, R3].set(r3)

    start_ids = jnp.asarray([_codon_id(s) for s in _STARTS])
    stop_ids = jnp.asarray([_codon_id(s) for s in _STOPS])

    def bonus(is_hit, strength):
        return jnp.where(is_hit, jnp.float32(strength), jnp.float32(-strength))

    # forward-looking windows: the last two positions have no complete
    # forward codon (roll wraps to the sequence head)
    fwd_bad = (
        invalid
        | jnp.roll(invalid, -1, axis=1)
        | jnp.roll(invalid, -2, axis=1)
        | (pos >= l - 2)
    )
    # + strand: gene opens at i with a start codon STARTING at i
    cod_start = c * 16 + jnp.roll(c, -1, axis=1) * 4 + jnp.roll(c, -2, axis=1)
    start_bonus = bonus(
        (cod_start[..., None] == start_ids[None, None, :]).any(-1) & ~fwd_bad,
        p.start_codon_bonus,
    )
    # + strand: gene closes entering NC at i; its stop codon ENDS at i-1
    is_stop_end = (codon[..., None] == stop_ids[None, None, :]).any(-1)
    stop_bonus = bonus(jnp.roll(is_stop_end, 1, axis=1), p.stop_codon_bonus)
    # - strand: gene opens (leftmost + position i) with the minus-strand
    # STOP codon occupying (i, i+1, i+2): read 5'->3' on minus it is
    # revcomp(c[i+2], c[i+1], c[i])
    rcod_start = (
        (3 - jnp.roll(c, -2, axis=1)) * 16 + (3 - jnp.roll(c, -1, axis=1)) * 4 + (3 - c)
    )
    rev_begin_bonus = bonus(
        (rcod_start[..., None] == stop_ids[None, None, :]).any(-1) & ~fwd_bad,
        p.stop_codon_bonus,
    )
    # - strand: gene closes entering NC at i; its minus START codon is the
    # rcodon ENDING at i-1
    ris_start_end = (rcodon[..., None] == start_ids[None, None, :]).any(-1)
    rev_end_bonus = bonus(jnp.roll(ris_start_end, 1, axis=1), p.start_codon_bonus)
    return e, start_bonus, stop_bonus, rev_begin_bonus, rev_end_bonus


@functools.partial(jax.jit, static_argnames=("p_start", "min_len"))
def _viterbi(codes, e, start_bonus, stop_bonus, rev_begin_bonus, rev_end_bonus,
             p_start: float, min_len: int):
    b, l = codes.shape
    neg_big = jnp.float32(-1e9)
    log_stay = jnp.float32(np.log1p(-2 * p_start))
    log_go = jnp.float32(np.log(p_start))

    def step(carry, xs):
        dp = carry  # [B, 7]
        e_i, sb_i, pb_i, rbb_i, reb_i = xs  # emissions/bonuses at position i
        cand = jnp.full((b, NSTATE, NSTATE), neg_big)  # [B, to, from]
        # noncoding: stay, or close a forward gene (stop), or close a rev gene
        cand = cand.at[:, NC, NC].set(dp[:, NC] + log_stay)
        cand = cand.at[:, NC, F3].set(dp[:, F3] + pb_i)
        cand = cand.at[:, NC, R3].set(dp[:, R3] + reb_i)
        # forward gene: open from nc (start codon bonus), or codon loop
        cand = cand.at[:, F1, NC].set(dp[:, NC] + log_go + sb_i)
        cand = cand.at[:, F1, F3].set(dp[:, F3])
        cand = cand.at[:, F2, F1].set(dp[:, F1])
        cand = cand.at[:, F3, F2].set(dp[:, F2])
        # reverse gene: opens with a (revcomp) stop, closes with a rev start
        cand = cand.at[:, R1, NC].set(dp[:, NC] + log_go + rbb_i)
        cand = cand.at[:, R1, R3].set(dp[:, R3])
        cand = cand.at[:, R2, R1].set(dp[:, R1])
        cand = cand.at[:, R3, R2].set(dp[:, R2])
        best_from = jnp.argmax(cand, axis=2).astype(jnp.int8)
        dp_new = jnp.max(cand, axis=2) + e_i
        return dp_new, best_from

    e_t = jnp.moveaxis(e, 1, 0)
    xs = (
        e_t,
        jnp.moveaxis(start_bonus, 1, 0),
        jnp.moveaxis(stop_bonus, 1, 0),
        jnp.moveaxis(rev_begin_bonus, 1, 0),
        jnp.moveaxis(rev_end_bonus, 1, 0),
    )
    dp0 = jnp.full((b, NSTATE), neg_big).at[:, NC].set(0.0)
    dp_final, bps = jax.lax.scan(step, dp0, xs)  # bps [L, B, 7]

    # backtrace
    last = jnp.argmax(dp_final, axis=1).astype(jnp.int8)  # [B]

    def back(carry, bp_i):
        st = carry  # [B]
        prev = jnp.take_along_axis(bp_i, st[:, None].astype(jnp.int32), axis=1)[:, 0]
        return prev, st

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True)
    return path_rev  # [L, B] states


def _translate(nt: str) -> str:
    aa = []
    for i in range(0, len(nt) - 2, 3):
        aa.append(_CODON_AA.get(nt[i : i + 3].upper(), "X"))
    s = "".join(aa)
    return s[:-1] if s.endswith("*") else s


_REVCOMP = bytes.maketrans(b"ACGT", b"TGCA")


def predict_genes(seq: bytes, params: GenePredParams | None = None) -> List[Gene]:
    """Call genes on one contig. Returns Gene records with translations."""
    from ..io.codec import encode_dna

    p = params or GenePredParams()
    codes = encode_dna(seq)
    l = len(codes)
    if l < p.min_gene_len:
        return []
    # pad to power-of-two-ish buckets so contigs of any length reuse a
    # handful of compiled Viterbi programs
    target = 1 << 12
    while target < l:
        target <<= 1
    codes_j = jnp.asarray(np.pad(codes, (0, target - l), constant_values=255))[None, :]
    e, sb, pb, rbb, reb = _precompute_scores(codes_j, p)
    path = np.asarray(
        _viterbi(codes_j, e, sb, pb, rbb, reb, p.p_gene_start, p.min_gene_len)
    )[:, 0][:l]

    genes: List[Gene] = []
    coding_f = (path >= F1) & (path <= F3)
    coding_r = (path >= R1) & (path <= R3)
    for coding, strand in ((coding_f, "+"), (coding_r, "-")):
        edges = np.flatnonzero(np.diff(coding.astype(np.int8)))
        starts = edges[coding[edges + 1]] + 1 if len(edges) else np.array([], int)
        ends = edges[~coding[edges + 1]] + 1 if len(edges) else np.array([], int)
        if coding[0]:
            starts = np.concatenate([[0], starts])
        if coding[-1]:
            ends = np.concatenate([ends, [l]])
        for s0, e0 in zip(starts, ends):
            ln = e0 - s0
            ln -= ln % 3
            e0 = s0 + ln
            if ln < p.min_gene_len:
                continue
            nt = seq[s0:e0].decode("ascii", "replace").upper()
            if strand == "-":
                nt_cds = nt.encode().translate(_REVCOMP)[::-1].decode()
            else:
                nt_cds = nt
            if p.whole_genes_only:
                # -w 1: only complete genes. Trim the 5' end to the first
                # in-frame start codon (the Viterbi opening can be a few
                # codons off); require a terminal stop.
                start_off = next(
                    (i for i in range(0, len(nt_cds) - 2, 3)
                     if nt_cds[i : i + 3] in _STARTS),
                    None,
                )
                if start_off is None or nt_cds[-3:] not in _STOPS:
                    continue
                nt_cds = nt_cds[start_off:]
                if len(nt_cds) < p.min_gene_len:
                    continue
                if strand == "+":
                    s0 += start_off
                else:
                    e0 -= start_off
            aa = _translate(nt_cds)
            if "*" in aa:
                continue  # internal stop: reject
            genes.append(Gene(start=int(s0), end=int(e0), strand=strand, nt=nt_cds, aa=aa))
    genes.sort(key=lambda g: g.start)
    return genes
