"""hmmsearch fidelity: engine bit scores vs a HMMER3-semantics oracle.

No HMMER binary or pyhmmer ships in this image, so ground truth is an
independent numpy implementation of HMMER3's DEFAULT scoring semantics
(multihit local Viterbi with the length-dependent N/J/C loop model and
null1 subtraction — the published p7_ProfileConfig + generic Viterbi of
Eddy 2011 "Accelerated profile HMM searches", PLoS Comp Biol 7:e1002195),
run over the real GTDB marker profiles shipped with the reference
(/root/reference/data/HMM_bacteria, 120 bacterial Pfam/TIGRFAM models).

The engine (models/hmmprofile.py) implements the same semantics in
float32 on device, so the expected residual is float32 rounding only
(|delta| << 0.1 bits).  This script MEASURES it on real profiles x
{consensus, mutated, two-domain, random} targets and records the
GA-decision agreement rate; it also reports the unihit-config scores
for reference.

Usage: python scripts/hmmsearch_fidelity.py [hmm_dir] [n_profiles]
Writes HMMSEARCH_FIDELITY.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json
import math
import time

import numpy as np


def log(m):
    print(f"[hmm-fid {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def oracle_score(prof, seq_idx: np.ndarray) -> float:
    """HMMER3 default-config bit score (multihit local Viterbi).

    prof: ProfileHMM (log-odds match scores msc[L+1,20] relative to bg,
    transitions in log space).  seq_idx: int32 residue indices.

    Length model (p7_ReconfigLength): loop = log(L/(L+2)) for N/C/J self
    transitions, move = log(2/(L+2)); multihit E->{J,C} = log(1/2) each;
    entry B->Mk = log(2(Lp-k+1)/(Lp(Lp+1))), exit Mk->E = 0 (implicit
    local); insert emissions at background (log-odds 0), null2 omitted.
    Score = (viterbi - null1) / ln 2, null1 = L*log(L/(L+1)) + log(1/(L+1)).
    """
    msc = prof.match_logodds            # [Lp+1, 20] log-odds (nats)
    tr = prof.trans              # [Lp+1, 7]: MM MI MD IM II DM DD
    Lp = msc.shape[0] - 1
    L = len(seq_idx)
    if L == 0:
        return -np.inf
    loop = math.log(L / (L + 2.0))
    move = math.log(2.0 / (L + 2.0))
    log_half = math.log(0.5)
    k = np.arange(1, Lp + 1, dtype=np.float64)
    tbm = np.log(2.0 * (Lp - k + 1) / (Lp * (Lp + 1.0)))  # B->Mk

    NEG = -1e30
    M = np.full(Lp + 1, NEG)
    I = np.full(Lp + 1, NEG)
    D = np.full(Lp + 1, NEG)
    xN, xB, xE, xJ, xC = 0.0, move, NEG, NEG, NEG
    tMM, tMI, tMD = tr[:, 0], tr[:, 1], tr[:, 2]
    tIM, tII = tr[:, 3], tr[:, 4]
    tDM, tDD = tr[:, 5], tr[:, 6]
    for i in range(1, L + 1):
        x = int(seq_idx[i - 1])
        em = msc[1:, x]  # [Lp]
        Mn = np.full(Lp + 1, NEG)
        cand = np.maximum.reduce([
            M[:-1] + tMM[:-1], I[:-1] + tIM[:-1], D[:-1] + tDM[:-1],
            np.full(Lp, xB) + tbm,
        ])
        Mn[1:] = em + cand
        In = np.maximum(M + tMI, I + tII)  # insert emission log-odds 0
        Dn = np.full(Lp + 1, NEG)
        for j in range(2, Lp + 1):  # delete chain (serial; oracle is slow ok)
            Dn[j] = max(Mn[j - 1] + tMD[j - 1], Dn[j - 1] + tDD[j - 1])
        xE = np.max(Mn[1:])  # Mk->E = 0, local exits
        xJn = max(xJ + loop, xE + log_half)
        xCn = max(xC + loop, xE + log_half)
        xNn = xN + loop
        xBn = max(xNn + move, xJn + move)
        M, I, D = Mn, In, Dn
        xN, xB, xE, xJ, xC = xNn, xBn, xE, xJn, xCn
    null1 = L * math.log(L / (L + 1.0)) + math.log(1.0 / (L + 1.0))
    vit = xC + move
    return (vit - null1) / math.log(2.0)


def oracle_forward_score(prof, seq_idx: np.ndarray) -> float:
    """Forward twin of oracle_score: logsumexp over alignments, same
    length model.  Serial float64 numpy — deliberately structured as the
    textbook row-by-row recursion (independent of the engine's
    associative-scan delete chain)."""
    msc = prof.match_logodds.astype(np.float64)
    tr = prof.trans.astype(np.float64)
    Lp = msc.shape[0] - 1
    L = len(seq_idx)
    if L == 0:
        return -np.inf
    loop = math.log(L / (L + 2.0))
    move = math.log(2.0 / (L + 2.0))
    log_half = math.log(0.5)
    k = np.arange(1, Lp + 1, dtype=np.float64)
    tbm = np.log(2.0 * (Lp - k + 1) / (Lp * (Lp + 1.0)))

    NEG = -1e30
    lse = np.logaddexp
    M = np.full(Lp + 1, NEG)
    I = np.full(Lp + 1, NEG)
    D = np.full(Lp + 1, NEG)
    xN, xB, xJ, xC = 0.0, move, NEG, NEG
    tMM, tMI, tMD = tr[:, 0], tr[:, 1], tr[:, 2]
    tIM, tII = tr[:, 3], tr[:, 4]
    tDM, tDD = tr[:, 5], tr[:, 6]
    for i in range(1, L + 1):
        x = int(seq_idx[i - 1])
        em = msc[1:, x]
        Mn = np.full(Lp + 1, NEG)
        cand = lse(lse(M[:-1] + tMM[:-1], I[:-1] + tIM[:-1]),
                   lse(D[:-1] + tDM[:-1], np.full(Lp, xB) + tbm))
        Mn[1:] = em + cand
        In = lse(M + tMI, I + tII)
        Dn = np.full(Lp + 1, NEG)
        for j in range(2, Lp + 1):  # serial delete chain
            Dn[j] = lse(Mn[j - 1] + tMD[j - 1], Dn[j - 1] + tDD[j - 1])
        m = Mn[1:].max()
        xE = m + math.log(np.exp(Mn[1:] - m).sum())
        xJn = lse(xJ + loop, xE + log_half)
        xCn = lse(xC + loop, xE + log_half)
        xNn = xN + loop
        xBn = lse(xNn + move, xJn + move)
        M, I, D = Mn, In, Dn
        xN, xB, xJ, xC = xNn, xBn, xJn, xCn
    null1 = L * math.log(L / (L + 1.0)) + math.log(1.0 / (L + 1.0))
    return (xC + move - null1) / math.log(2.0)


def consensus_seq(prof) -> np.ndarray:
    return np.argmax(prof.match_logodds[1:], axis=1).astype(np.int32)


def main():
    hmm_dir = (sys.argv[1] if len(sys.argv) > 1
               else "/root/reference/data/HMM_bacteria")
    n_prof = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000  # all

    from gsearch_tpu.models.hmmprofile import HmmSearcher, parse_hmmer3
    from gsearch_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    files = sorted(glob.glob(os.path.join(hmm_dir, "*.HMM")))[:n_prof]
    if not files:
        log(f"no .HMM files under {hmm_dir}; nothing to do")
        return
    profiles = [p for f in files for p in parse_hmmer3(f)]
    log(f"{len(profiles)} profiles")
    rng = np.random.default_rng(0x4A1D)

    rows = []
    engine = HmmSearcher(profiles)           # multihit (default)
    engine_uni = HmmSearcher(profiles, multihit=False)
    for h, prof in enumerate(profiles):
        cons = consensus_seq(prof)
        flank = lambda n: rng.integers(0, 20, n).astype(np.int32)
        mut = cons.copy()
        pos = rng.choice(len(mut), max(1, len(mut) // 5), replace=False)
        mut[pos] = rng.integers(0, 20, len(pos))
        targets = {
            "consensus": np.concatenate([flank(25), cons, flank(25)]),
            "mutated20pct": np.concatenate([flank(25), mut, flank(25)]),
            "two_domain": np.concatenate(
                [flank(20), cons, flank(40), cons, flank(20)]),
            "random": flank(max(2 * len(cons), 120)),
        }
        seqs = list(targets.values())
        got = engine.score(seqs)[h]
        got_uni = engine_uni.score(seqs)[h]
        got_fwd = engine.score(seqs, algo="forward")[h]
        for t, (name, seq) in enumerate(targets.items()):
            want = oracle_score(prof, seq)
            want_fwd = oracle_forward_score(prof, seq)
            ga = None if math.isnan(prof.ga) else prof.ga
            rows.append({
                "profile": prof.name, "target": name,
                "oracle_bits": round(float(want), 2),
                "engine_bits": round(float(got[t]), 2),
                "oracle_fwd_bits": round(float(want_fwd), 2),
                "engine_fwd_bits": round(float(got_fwd[t]), 2),
                "engine_unihit_bits": round(float(got_uni[t]), 2),
                "delta": round(float(got[t] - want), 2),
                "delta_fwd": round(float(got_fwd[t] - want_fwd), 2),
                "ga": ga,
                # GA decisions follow the FORWARD score (as the CLI and
                # real hmmsearch do)
                "ga_agree": (None if ga is None
                             else bool((got_fwd[t] >= ga) == (want_fwd >= ga))),
            })
        log(f"{prof.name}: " + "  ".join(
            f"{r['target']}:eng={r['engine_bits']}/{r['engine_fwd_bits']}f "
            f"orc={r['oracle_bits']}/{r['oracle_fwd_bits']}f"
            for r in rows[-4:]))

    deltas = np.array([r["delta"] for r in rows])
    deltas_f = np.array([r["delta_fwd"] for r in rows])
    by_cat = {}
    for cat in ("consensus", "mutated20pct", "two_domain", "random"):
        d = np.array([r["delta"] for r in rows if r["target"] == cat])
        df = np.array([r["delta_fwd"] for r in rows if r["target"] == cat])
        by_cat[cat] = {"mean": round(float(d.mean()), 3),
                       "sd": round(float(d.std()), 3),
                       "max_abs": round(float(np.abs(d).max()), 3),
                       "fwd_mean": round(float(df.mean()), 3),
                       "fwd_max_abs": round(float(np.abs(df).max()), 3)}
    agree = [r["ga_agree"] for r in rows if r["ga_agree"] is not None]
    out = {
        "note": ("oracle = independent float64 re-implementation of "
                 "HMMER3 default semantics (no HMMER/pyhmmer in image); "
                 "validates internal consistency + float32 numerics, NOT "
                 "byte parity with HMMER itself"),
        "n_profiles": len(profiles), "n_pairs": len(rows),
        "delta_mean": round(float(deltas.mean()), 3),
        "delta_sd": round(float(deltas.std()), 3),
        "delta_fwd_mean": round(float(deltas_f.mean()), 3),
        "delta_fwd_sd": round(float(deltas_f.std()), 3),
        "delta_by_category": by_cat,
        "ga_decision_agreement": (round(sum(agree) / len(agree), 4)
                                  if agree else None),
        "rows": rows,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "HMMSEARCH_FIDELITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    log(f"delta mean {out['delta_mean']} sd {out['delta_sd']}; "
        f"GA agreement {out['ga_decision_agreement']}")


if __name__ == "__main__":
    main()
