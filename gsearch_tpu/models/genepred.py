"""Prokaryotic gene prediction — the FragGeneScan role, TPU-native.

Capability-equivalent of FragGeneScanRs as shipped with the reference
(reference: binaux/src/bin/FragGeneScanRs.rs:26-272 — HMM/Viterbi gene
calls over genomes/reads producing .faa/.ffn/.gff/.out, used to generate
the proteomes that AA mode consumes, README.md:533-560).

Model: an 11-state, 3-periodic codon HMM
    0: noncoding
    1..3: coding forward, codon positions 1..3
    4..6: coding reverse-complement, codon positions 1..3
    7..8: forward insert states (between codon positions 1-2 / 2-3)
    9..10: reverse insert states
with full-codon emissions attached to the third codon position (a 64-entry
log-usage table — in-frame stop codons get a hard floor, which is what
keeps genes open), and position-dependent transition bonuses for start
codons (ATG/GTG/TTG at nc->M1 / reverse stops for the minus strand) and
stop codons (M3->nc).  The reference's trained dicodon tables drop in as a
4096-entry P(codon | previous codon) table (GeneModel below).

Sequencing-error (indel) states — the role of FragGeneScan's I1..I6 match/
insert architecture for error-prone reads (FragGeneScanRs.rs viterbi's
insertion/deletion handling): when `allow_indels` is on, an inserted base
is a detour through an insert state (F1 -> FI1 -> F2, penalized by
log(indel_rate) per inserted base, self-loop for runs), and a deleted base
is a penalized phase-skip transition (F3 -> F2, F1 -> F3, F2 -> F1 skip one
codon position).  The decoded path then drives *read correction* exactly
like the reference tool's: inserted bases are dropped from the reported
CDS and deleted bases come back as `N` (translating to `X`), so the
downstream protein stays in frame across the error.

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

NSTATE = 11
NC, F1, F2, F3, R1, R2, R3, FI1, FI2, RI1, RI2 = range(11)

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


# E. coli K-12 codon usage (occurrences per 1000 codons, standard published
# table) — the built-in prior when no trained model is supplied.  The
# reference tool never runs untrained either: it ships CG-binned tables
# (FragGeneScanRs.rs:116-119); these are the 50%-CG-bin analog.
_ECOLI_USAGE_PER_1000 = {
    "TTT": 22.2, "TTC": 16.6, "TTA": 13.9, "TTG": 13.7, "CTT": 11.0,
    "CTC": 11.0, "CTA": 3.9, "CTG": 52.6, "ATT": 30.3, "ATC": 25.1,
    "ATA": 4.4, "ATG": 27.9, "GTT": 18.3, "GTC": 15.3, "GTA": 10.9,
    "GTG": 26.4, "TCT": 8.5, "TCC": 8.6, "TCA": 7.2, "TCG": 8.9,
    "CCT": 7.0, "CCC": 5.5, "CCA": 8.4, "CCG": 23.2, "ACT": 9.0,
    "ACC": 23.4, "ACA": 7.1, "ACG": 14.4, "GCT": 15.3, "GCC": 25.5,
    "GCA": 20.1, "GCG": 33.6, "TAT": 16.2, "TAC": 12.2, "TAA": 2.0,
    "TAG": 0.2, "CAT": 12.9, "CAC": 9.7, "CAA": 15.3, "CAG": 28.8,
    "AAT": 17.7, "AAC": 21.7, "AAA": 33.6, "AAG": 10.3, "GAT": 32.1,
    "GAC": 19.1, "GAA": 39.4, "GAG": 17.8, "TGT": 5.2, "TGC": 6.4,
    "TGA": 0.9, "TGG": 15.2, "CGT": 20.9, "CGC": 22.0, "CGA": 3.6,
    "CGG": 5.4, "AGT": 8.8, "AGC": 16.1, "AGA": 2.1, "AGG": 1.2,
    "GGT": 24.7, "GGC": 29.6, "GGA": 8.0, "GGG": 11.1,
}


def synonymous_smooth(p: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend codon probabilities toward each amino acid's synonymous
    marginal (last axis).

    The coding signal has three parts: in-frame-stop avoidance, amino-acid
    composition, and organism-specific codon bias.  An unsmoothed table
    stakes everything on the third: on a genome whose synonymous bias
    differs from the table's, per-codon log-odds go NEGATIVE even inside
    real genes (measured: a synonymous-permuted control dropped
    sensitivity to 0.12, scripts/bench_genepred.py heldout section).
    Blending half the mass to the AA marginal keeps the first two signals
    organism-independent while retaining half the bias signal
    in-distribution."""
    out = np.asarray(p, np.float64)
    sm = out.copy()
    for aa, ids in _AA_FAMILIES.items():
        if aa == "*":
            continue
        sm[..., ids] = out[..., ids].sum(axis=-1, keepdims=True) / len(ids)
    res = (1.0 - alpha) * out + alpha * sm
    return res / res.sum(axis=-1, keepdims=True)


_AA_FAMILIES: dict = {}
for _codon, _aa in _CODON_AA.items():
    _AA_FAMILIES.setdefault(_aa, []).append(_codon_id(_codon))


def default_codon_logusage() -> np.ndarray:
    """Built-in 64-entry codon log-usage: E. coli K-12 bias, synonymous-
    smoothed (see synonymous_smooth), with in-frame stops floored.
    Replaceable via GenePredParams / GeneModel."""
    usage = np.full(64, 1e-7, dtype=np.float64)
    for codon, per1000 in _ECOLI_USAGE_PER_1000.items():
        usage[_codon_id(codon)] = max(per1000, 1e-4)
    usage = synonymous_smooth(usage / usage.sum())
    for s in _STOPS:
        usage[_codon_id(s)] = 1e-4  # in-frame stop: hard floor keeps ORFs open
    usage /= usage.sum()
    return np.log(usage).astype(np.float32)


def _floor_stops(p: np.ndarray, floor: float = 1e-4) -> np.ndarray:
    """Pin in-frame stop codons to a small FIXED probability (last axis).

    Training drives stop counts to ~0; the raw log would make emitting a
    gene's own terminal stop so expensive that Viterbi refuses to open the
    gene at all.  A fixed floor keeps the stop penalty comparable to the
    explicit stop-transition bonus instead of dominating it."""
    out = np.array(p, dtype=np.float64)
    idx = [_codon_id(s) for s in _STOPS]
    out[..., idx] = floor
    return out / out.sum(axis=-1, keepdims=True)


class GeneModel:
    """CG-content-binned codon + dicodon emission tables — the role of
    FragGeneScan's trained models (the reference loads per-CG-content
    train files and picks tables by each record's CG content,
    binaux/src/bin/FragGeneScanRs.rs:116-119,225-243).

    cg_bins [B] (percent), codon_logusage [B, 64], and optionally
    dicodon_logusage [B, 64, 64] = log P(codon | previous codon)."""

    def __init__(self, cg_bins, codon_logusage, dicodon_logusage=None):
        self.cg_bins = np.asarray(cg_bins, dtype=np.float32)
        self.codon_logusage = np.asarray(codon_logusage, dtype=np.float32)
        self.dicodon_logusage = (
            None if dicodon_logusage is None
            else np.asarray(dicodon_logusage, dtype=np.float32)
        )

    def tables_for(self, cg_percent: float):
        b = int(np.argmin(np.abs(self.cg_bins - cg_percent)))
        di = None if self.dicodon_logusage is None else self.dicodon_logusage[b]
        return self.codon_logusage[b], di

    def save(self, path: str) -> None:
        arrs = {"cg_bins": self.cg_bins, "codon_logusage": self.codon_logusage}
        if self.dicodon_logusage is not None:
            arrs["dicodon_logusage"] = self.dicodon_logusage
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "GeneModel":
        g = np.load(path)
        return cls(g["cg_bins"], g["codon_logusage"],
                   g["dicodon_logusage"] if "dicodon_logusage" in g else None)

    @classmethod
    def train_from_cds(cls, cds_list, nb_bins: int = 9,
                       cg_lo: float = 30.0, cg_hi: float = 70.0) -> "GeneModel":
        """Estimate CG-binned codon + dicodon tables from in-frame coding
        sequences (the self-training analog of FragGeneScan's offline
        training pipeline).  Each CDS contributes to its own CG bin;
        add-one smoothing; empty bins inherit the global tables."""
        bins = np.linspace(cg_lo, cg_hi, nb_bins)
        cnt = np.ones((nb_bins, 64), dtype=np.float64)
        dcnt = np.zeros((nb_bins, 64, 64), dtype=np.float64)
        gcnt = np.ones(64, dtype=np.float64)
        gdcnt = np.zeros((64, 64), dtype=np.float64)
        touched = np.zeros(nb_bins, dtype=bool)
        for cds in cds_list:
            seq = cds.decode() if isinstance(cds, (bytes, bytearray)) else cds
            seq = seq.upper()
            if len(seq) < 6:
                continue
            cg = 100.0 * sum(c in "GC" for c in seq) / len(seq)
            b = int(np.argmin(np.abs(bins - cg)))
            touched[b] = True
            prev = None
            for i in range(0, len(seq) - 2, 3):
                tri = seq[i:i + 3]
                if any(c not in _CODE_BASE for c in tri):
                    prev = None
                    continue
                cid = _codon_id(tri)
                cnt[b, cid] += 1
                gcnt[cid] += 1
                if prev is not None:
                    dcnt[b, prev, cid] += 1
                    gdcnt[prev, cid] += 1
                prev = cid
        for b in range(nb_bins):
            if not touched[b]:
                cnt[b] = gcnt
                dcnt[b] = gdcnt
        codon_p = _floor_stops(cnt / cnt.sum(axis=1, keepdims=True))
        # smooth dicodon rows toward the bin's MARGINAL usage (not uniform):
        # unseen prev-codon rows then score like the codon table instead of
        # flat 1/64, so sparse training never scores worse than marginal
        alpha = 8.0
        dcnt = dcnt + alpha * codon_p[:, None, :]
        dicodon_p = _floor_stops(dcnt / dcnt.sum(axis=2, keepdims=True))
        return cls(bins, np.log(codon_p).astype(np.float32),
                   np.log(dicodon_p).astype(np.float32))

    @classmethod
    def from_fgs_gene_file(cls, path: str) -> "GeneModel":
        """Best-effort loader for FragGeneScan-format `gene` train files
        (sections: one CG-percent header line, then 6 codon-period blocks
        of 16 lines x 4 transition probabilities P(base | 2 prev bases);
        reference consumption site: FragGeneScanRs.rs:116-119).  The
        second codon's three periods convert to P(codon2 | codon1):
        P(u|yz) P(v|zu) P(w|uv) for c1=xyz, c2=uvw."""
        sections = []
        cur_cg, rows = None, []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if len(parts) == 1:
                    if cur_cg is not None and len(rows) >= 96:
                        sections.append((cur_cg, rows[:96]))
                    cur_cg, rows = float(parts[0]), []
                else:
                    rows.append([float(x) for x in parts[:4]])
        if cur_cg is not None and len(rows) >= 96:
            sections.append((cur_cg, rows[:96]))
        if not sections:
            raise ValueError(f"no CG sections parsed from {path}")
        cg_bins, codons, dicodons = [], [], []
        floor = 1e-9
        for cg, rows in sections:
            e = np.asarray(rows, dtype=np.float64).reshape(6, 16, 4)
            e = np.maximum(e, floor)
            di = np.zeros((64, 64), dtype=np.float64)
            for c1 in range(64):
                y, z = (c1 >> 2) & 3, c1 & 3
                for c2 in range(64):
                    u, v, w = (c2 >> 4) & 3, (c2 >> 2) & 3, c2 & 3
                    di[c1, c2] = (e[3, y * 4 + z, u] * e[4, z * 4 + u, v]
                                  * e[5, u * 4 + v, w])
            di = _floor_stops(di / di.sum(axis=1, keepdims=True))
            cg_bins.append(cg)
            dicodons.append(np.log(di))
            # marginal codon table from the stationary dicodon chain
            marg = di.mean(axis=0)
            codons.append(np.log(_floor_stops(marg / marg.sum())))
        return cls(np.asarray(cg_bins), np.asarray(codons, dtype=np.float32),
                   np.asarray(dicodons, dtype=np.float32))


@dataclasses.dataclass
class GenePredParams:
    codon_logusage: np.ndarray = dataclasses.field(default_factory=default_codon_logusage)
    dicodon_logusage: np.ndarray | None = None  # [64, 64] log P(codon|prev)
    model: "GeneModel | None" = None      # CG-binned tables; overrides the two above
    p_gene_start: float = 1.0 / 400.0     # nc -> gene rate per strand
    start_codon_bonus: float = 3.0        # extra for ATG/GTG/TTG at gene start
    #: extra for a proper stop at gene end; None resolves by mode in
    #: __post_init__.  Whole-genome calling: 9.0, tuned on the realistic
    #: planted-genome benchmark (scripts/bench_genepred.py, GENEPRED_BENCH:
    #: 6.0 left sensitivity at 0.53; 9.0 reaches sens 1.0 / prec 0.97+
    #: across the start-bonus / p_gene_start grid).  Read mode with indel
    #: states: 6.0 — a larger stop bonus makes "stop at the frameshift +
    #: restart" outscore the insert-state detour, truncating exactly the
    #: genes the error model exists to rescue.
    stop_codon_bonus: float | None = None
    min_gene_len: int = 90                # nt, reference default ORF floor
    whole_genes_only: bool = True         # -w 1 equivalent
    #: enable the sequencing-error states (FragGeneScan's short-read error
    #: model); typically paired with whole_genes_only=False for raw reads
    allow_indels: bool = False
    #: per-base insertion/deletion rate when allow_indels (FGS train files
    #: ship ~1e-2 for 454 reads, ~1e-4 for complete genomes)
    indel_rate: float = 1e-2

    @property
    def stop_bonus(self) -> float:
        """Mode-resolved stop bonus (None default -> 9.0 whole-genome,
        6.0 with the indel/read error model); resolved at use time because
        callers toggle allow_indels after construction."""
        if self.stop_codon_bonus is not None:
            return self.stop_codon_bonus
        return 6.0 if self.allow_indels else 9.0


@dataclasses.dataclass
class Gene:
    start: int      # 0-based, inclusive
    end: int        # exclusive
    strand: str     # '+' or '-'
    nt: str
    aa: str


def _precompute_scores(codes: jnp.ndarray, codon_lu, dicodon_lu,
                       start_codon_bonus, stop_codon_bonus):
    """codes [B, L] -> per-position emissions [B, L, NSTATE] and bonuses.

    Traceable: called under jit with the bonus strengths as traced scalars
    (parameter sweeps and trained models then share one compiled program)."""
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

    usage = jnp.asarray(codon_lu)
    neg_big = jnp.float32(-1e9)

    # emissions: nc pays log(1/4) per base; coding pays the full codon
    # log-score at the third codon position (M1/M2 emit 0), so one codon of
    # coding ~ log P(codon) competes with 3*log(1/4) of noncoding.  With a
    # dicodon table the score is P(codon | previous codon) — FragGeneScan's
    # trained-emission family (base probabilities conditioned on the two
    # preceding bases across the dicodon cycle) at codon granularity.
    m3 = jnp.take(usage, codon)
    r3 = jnp.take(usage, rcodon)
    if dicodon_lu is not None:
        di = jnp.asarray(dicodon_lu)  # [64, 64]
        # forward: previous codon in reading order ends at i-3
        prev = jnp.roll(codon, 3, axis=1)
        prev_bad = jnp.roll(codon_bad, 3, axis=1) | (pos < 5)
        m3 = jnp.where(prev_bad, m3, di[prev.reshape(-1), codon.reshape(-1)]
                       .reshape(b, l))
        # reverse: minus-strand genes read right-to-left, so the codon read
        # before the one ending at i is the rcodon ending at i+3
        rprev = jnp.roll(rcodon, -3, axis=1)
        rprev_bad = jnp.roll(codon_bad, -3, axis=1) | (pos >= l - 3)
        r3 = jnp.where(rprev_bad, r3, di[rprev.reshape(-1), rcodon.reshape(-1)]
                       .reshape(b, l))
    e = jnp.zeros((b, l, NSTATE), dtype=jnp.float32)
    log_quarter = jnp.where(invalid, neg_big, jnp.float32(np.log(0.25)))
    e = e.at[:, :, NC].set(log_quarter)
    zero_or_inval = jnp.where(invalid, neg_big, jnp.float32(0.0))
    for st in (F1, F2, R1, R2):
        e = e.at[:, :, st].set(zero_or_inval)
    e = e.at[:, :, F3].set(jnp.where(codon_bad, neg_big, m3))
    e = e.at[:, :, R3].set(jnp.where(codon_bad, neg_big, r3))
    # insert states emit a flat base like noncoding; the error cost itself
    # is the log(indel_rate) transition into them
    for st in (FI1, FI2, RI1, RI2):
        e = e.at[:, :, st].set(log_quarter)

    start_ids = jnp.asarray([_codon_id(s) for s in _STARTS])
    stop_ids = jnp.asarray([_codon_id(s) for s in _STOPS])

    def bonus(is_hit, strength):
        strength = jnp.asarray(strength, jnp.float32)
        return jnp.where(is_hit, strength, -strength)

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
        start_codon_bonus,
    )
    # + strand: gene closes entering NC at i; its stop codon ENDS at i-1
    is_stop_end = (codon[..., None] == stop_ids[None, None, :]).any(-1)
    stop_bonus = bonus(jnp.roll(is_stop_end, 1, axis=1), stop_codon_bonus)
    # - strand: gene opens (leftmost + position i) with the minus-strand
    # STOP codon occupying (i, i+1, i+2): read 5'->3' on minus it is
    # revcomp(c[i+2], c[i+1], c[i])
    rcod_start = (
        (3 - jnp.roll(c, -2, axis=1)) * 16 + (3 - jnp.roll(c, -1, axis=1)) * 4 + (3 - c)
    )
    rev_begin_bonus = bonus(
        (rcod_start[..., None] == stop_ids[None, None, :]).any(-1) & ~fwd_bad,
        stop_codon_bonus,
    )
    # - strand: gene closes entering NC at i; its minus START codon is the
    # rcodon ENDING at i-1
    ris_start_end = (rcodon[..., None] == start_ids[None, None, :]).any(-1)
    rev_end_bonus = bonus(jnp.roll(ris_start_end, 1, axis=1), start_codon_bonus)
    return e, start_bonus, stop_bonus, rev_begin_bonus, rev_end_bonus


def _transition_table(log_stay, log_go, log_indel):
    """Static [from, to] log-transition matrix (position bonuses are the
    rank-1 terms added per step in _viterbi; see its docstring)."""
    neg_big = jnp.float32(-1e9)
    tb = jnp.full((NSTATE, NSTATE), neg_big)
    # noncoding: stay; forward/reverse genes close into NC (+stop bonuses)
    tb = tb.at[NC, NC].set(log_stay)
    tb = tb.at[F3, NC].set(0.0)
    tb = tb.at[R3, NC].set(0.0)
    # forward gene: open from NC (+start bonus), codon loop
    tb = tb.at[NC, F1].set(log_go)
    tb = tb.at[F3, F1].set(0.0)
    tb = tb.at[F1, F2].set(0.0)
    tb = tb.at[F2, F3].set(0.0)
    # reverse gene: opens with a (revcomp) stop, closes with a rev start
    tb = tb.at[NC, R1].set(log_go)
    tb = tb.at[R3, R1].set(0.0)
    tb = tb.at[R1, R2].set(0.0)
    tb = tb.at[R2, R3].set(0.0)
    # sequencing errors (log_indel = -1e9 prunes them):
    # insertions detour through FI/RI (self-loop for runs) ...
    tb = tb.at[F1, FI1].set(log_indel)
    tb = tb.at[FI1, FI1].set(log_indel)
    tb = tb.at[FI1, F2].set(0.0)
    tb = tb.at[F2, FI2].set(log_indel)
    tb = tb.at[FI2, FI2].set(log_indel)
    tb = tb.at[FI2, F3].set(0.0)
    tb = tb.at[R1, RI1].set(log_indel)
    tb = tb.at[RI1, RI1].set(log_indel)
    tb = tb.at[RI1, R2].set(0.0)
    tb = tb.at[R2, RI2].set(log_indel)
    tb = tb.at[RI2, RI2].set(log_indel)
    tb = tb.at[RI2, R3].set(0.0)
    # ... deletions skip one codon position
    tb = tb.at[F1, F3].set(log_indel)
    tb = tb.at[F2, F1].set(log_indel)
    tb = tb.at[F3, F2].set(log_indel)
    tb = tb.at[R1, R3].set(log_indel)
    tb = tb.at[R2, R1].set(log_indel)
    tb = tb.at[R3, R2].set(log_indel)
    return tb


def _viterbi(e, start_bonus, stop_bonus, rev_begin_bonus, rev_end_bonus,
             dp0, p_start, log_indel):
    """Viterbi decode, batched over rows of e [B, L, NSTATE].

    The scan step is three fused ops: the [B, from, to] candidate tensor is
    dp + a STATIC transition table + two rank-1 position-bonus terms (the
    four position-dependent edges all touch NC: gene opens NC->F1/R1 carry
    the start/rev-begin bonus on the `to` side, gene closes F3/R3->NC carry
    the stop/rev-end bonus on the `from` side).  The earlier formulation
    scatter-built the candidate tensor edge by edge (25 ops/position) and
    ran ~40x slower at whole-genome lengths."""
    b = e.shape[0]
    tb = _transition_table(jnp.log1p(-2.0 * p_start), jnp.log(p_start),
                           log_indel)
    onehot_nc = jnp.zeros(NSTATE, jnp.float32).at[NC].set(1.0)
    # from-side bonuses (edges *->NC): F3 carries the forward stop bonus,
    # R3 the reverse gene's closing (rev start) bonus
    zeros = jnp.zeros(e.shape[:2] + (NSTATE,), jnp.float32)
    from_bon = zeros.at[:, :, F3].set(stop_bonus).at[:, :, R3].set(
        rev_end_bonus)
    to_bon = zeros.at[:, :, F1].set(start_bonus).at[:, :, R1].set(
        rev_begin_bonus)
    nc_to = onehot_nc[None, None, :]
    nc_from = onehot_nc[None, :, None]

    def step(dp, xs):
        e_i, a_i, c_i = xs  # [B, NSTATE] each
        cand = (dp[:, :, None] + tb[None, :, :]
                + a_i[:, :, None] * nc_to + nc_from * c_i[:, None, :])
        best_from = jnp.argmax(cand, axis=1).astype(jnp.int8)
        dp_new = jnp.max(cand, axis=1) + e_i
        return dp_new, best_from

    xs = (jnp.moveaxis(e, 1, 0), jnp.moveaxis(from_bon, 1, 0),
          jnp.moveaxis(to_bon, 1, 0))
    dp_final, bps = jax.lax.scan(step, dp0, xs)  # bps [L, B, NSTATE]

    # backtrace
    last = jnp.argmax(dp_final, axis=1).astype(jnp.int8)  # [B]

    def back(st, bp_i):
        prev = jnp.take_along_axis(bp_i, st[:, None].astype(jnp.int32), axis=1)[:, 0]
        return prev, st

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True)
    return path_rev  # [L, B] states


@functools.partial(jax.jit, static_argnames=("has_di",))
def _decode_windows(codes, codon_lu, dicodon_lu, start_b, stop_b, p_start,
                    log_indel, dp0, *, has_di: bool):
    """codes [B, W] -> decoded state paths [B, W] (one fused program:
    emission/bonus precompute + Viterbi scan + backtrace)."""
    e, sb, pb, rbb, reb = _precompute_scores(
        codes, codon_lu, dicodon_lu if has_di else None, start_b, stop_b)
    path = _viterbi(e, sb, pb, rbb, reb, dp0, p_start, log_indel)
    return jnp.moveaxis(path, 0, 1)  # [B, W]


def _translate(nt: str) -> str:
    aa = []
    for i in range(0, len(nt) - 2, 3):
        aa.append(_CODON_AA.get(nt[i : i + 3].upper(), "X"))
    s = "".join(aa)
    return s[:-1] if s.endswith("*") else s


_REVCOMP = bytes.maketrans(b"ACGT", b"TGCA")

_INS_STATES = frozenset((FI1, FI2, RI1, RI2))
#: (prev, cur) state pairs only reachable through a deletion transition
_DEL_PAIRS = frozenset(
    ((F1, F3), (F2, F1), (F3, F2), (R1, R3), (R2, R1), (R3, R2)))


def _correct_span(seq: bytes, path: np.ndarray, s0: int, e0: int) -> str:
    """Error-corrected CDS of a decoded gene span: insertion-state bases
    are dropped, deletion transitions put an N back in their place."""
    raw = seq[s0:e0].decode("ascii", "replace").upper()
    out = []
    for off, ch in enumerate(raw):
        j = s0 + off
        if off > 0 and (int(path[j - 1]), int(path[j])) in _DEL_PAIRS:
            out.append("N")
        if int(path[j]) in _INS_STATES:
            continue
        out.append(ch)
    return "".join(out)


#: whole-genome decoding window: contigs longer than _WINDOW split into
#: batched overlapping windows (TPU gets batch parallelism instead of one
#: multi-hundred-thousand-step serial scan; the reference tool gets its
#: parallelism the same way — across reads/records,
#: FragGeneScanRs.rs:225-243 chunked(100) rayon)
_WINDOW = 8192
#: per-side overlap: Viterbi forgets the window boundary well within this
#: (the correct frame beats wrong frames by ~1 nat/codon, so a few hundred
#: bases pin it); core labels are then boundary-insensitive and stitch
#: cleanly
_OVERLAP = 1024
#: max windows decoded per device dispatch
_MAX_BATCH = 64

_NEG_BIG = -1e9


def _decode_path(codes: np.ndarray, p: GenePredParams, codon_lu,
                 dicodon_lu) -> np.ndarray:
    """Full-contig Viterbi state path [L] via batched overlapping windows."""
    l = len(codes)
    start_b = jnp.float32(p.start_codon_bonus)
    stop_b = jnp.float32(p.stop_bonus)
    p_start = jnp.float32(p.p_gene_start)
    log_indel = jnp.float32(np.log(p.indel_rate) if p.allow_indels else _NEG_BIG)
    clu = jnp.asarray(codon_lu)
    has_di = dicodon_lu is not None
    dlu = jnp.asarray(dicodon_lu) if has_di else jnp.zeros((64, 64), jnp.float32)

    def run(win_codes: np.ndarray, first_row0: bool) -> np.ndarray:
        nb, w = win_codes.shape
        dp0 = np.zeros((nb, NSTATE), np.float32)
        if first_row0:
            # true sequence start: begin in NC (interior windows may open
            # mid-gene, so they start unconstrained)
            dp0[0, :] = _NEG_BIG
            dp0[0, NC] = 0.0
        return np.asarray(_decode_windows(
            jnp.asarray(win_codes), clu, dlu, start_b, stop_b, p_start,
            log_indel, jnp.asarray(dp0), has_di=has_di))

    if l <= _WINDOW:
        # single window, padded to a power-of-two bucket for program reuse
        target = 1 << 12
        while target < l:
            target <<= 1
        win = np.pad(codes, (0, target - l), constant_values=255)[None, :]
        return run(win, True)[0, :l]

    core = _WINDOW - 2 * _OVERLAP
    n_win = -(-l // core)
    wins = np.full((n_win, _WINDOW), 255, np.uint8)
    spans = []  # (win_index, core offset within window, core start, core len)
    for i in range(n_win):
        c0 = i * core
        clen = min(core, l - c0)
        w0 = max(c0 - _OVERLAP, 0)
        take = min(_WINDOW, l - w0)
        wins[i, :take] = codes[w0 : w0 + take]
        spans.append((i, c0 - w0, c0, clen))

    path = np.empty(l, np.int8)
    for b0 in range(0, n_win, _MAX_BATCH):
        chunk = wins[b0 : b0 + _MAX_BATCH]
        nb = chunk.shape[0]
        bucket = 8
        while bucket < nb:
            bucket <<= 1
        bucket = min(bucket, _MAX_BATCH)
        if bucket > nb:
            chunk = np.concatenate(
                [chunk, np.full((bucket - nb, _WINDOW), 255, np.uint8)], 0)
        out = run(chunk, first_row0=b0 == 0)
        for i, off, c0, clen in spans[b0 : b0 + _MAX_BATCH]:
            path[c0 : c0 + clen] = out[i - b0, off : off + clen]
    return path


def predict_genes(seq: bytes, params: GenePredParams | None = None) -> List[Gene]:
    """Call genes on one contig. Returns Gene records with translations."""
    from ..io.codec import encode_dna

    p = params or GenePredParams()
    codes = encode_dna(seq)
    l = len(codes)
    if l < p.min_gene_len:
        return []
    codon_lu, dicodon_lu = p.codon_logusage, p.dicodon_logusage
    if p.model is not None:
        # CG-content-binned table selection, as the reference tool does per
        # record (FragGeneScanRs.rs:225-243 count_cg_content -> locals[cg])
        valid = codes < 4
        nv = int(valid.sum())
        cg = 100.0 * float(((codes == 1) | (codes == 2)).sum()) / max(nv, 1)
        codon_lu, dicodon_lu = p.model.tables_for(cg)
    path = _decode_path(codes, p, codon_lu, dicodon_lu)

    genes: List[Gene] = []
    coding_f = ((path >= F1) & (path <= F3)) | (path == FI1) | (path == FI2)
    coding_r = ((path >= R1) & (path <= R3)) | (path == RI1) | (path == RI2)
    for coding, strand in ((coding_f, "+"), (coding_r, "-")):
        edges = np.flatnonzero(np.diff(coding.astype(np.int8)))
        starts = edges[coding[edges + 1]] + 1 if len(edges) else np.array([], int)
        ends = edges[~coding[edges + 1]] + 1 if len(edges) else np.array([], int)
        if coding[0]:
            starts = np.concatenate([[0], starts])
        if coding[-1]:
            ends = np.concatenate([ends, [l]])
        for s0, e0 in zip(starts, ends):
            if p.allow_indels:
                # read correction, as the reference tool emits for error
                # reads: drop bases decoded as insertions, restore deleted
                # ones as N (-> X in the protein) so the frame holds
                nt = _correct_span(seq, path, int(s0), int(e0))
                if len(nt) < p.min_gene_len:
                    continue
            else:
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
            if p.allow_indels:
                nt_cds = nt_cds[: len(nt_cds) - len(nt_cds) % 3]
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
