"""Fit the superani AniRegression correction model.

skani always applies a learned regression that debiases raw chained
seed-identity ANI (reference: binaux/src/bin/superani.rs:107,129-131,
regression::get_model(c, true)); the raw estimator is biased low for
divergent / fragmented / rearranged pairs because (a) seed thinning (1/c)
under-samples short chained intervals and (b) chain breaks drop matched
anchors near boundaries.  This script measures that bias on synthetic
ladders spanning 80-100% true ANI x {clean, fragmented, rearranged,
fragmented+rearranged} genomes, fits a piecewise-linear correction in
(raw_ani, mean_af), and writes the bundled default model
gsearch_tpu/models/data/ani_regression_default.json.

Usage: python scripts/fit_ani_regression.py [genome_kb] [reps]
Writes the model JSON + ANI_REGRESSION_FIT.json (fit quality report).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def log(m):
    print(f"[ani-fit {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def mutate(rng, codes, p):
    """Point mutations at per-base rate p (uniform substitution to one of
    the three other bases)."""
    out = codes.copy()
    hit = rng.random(len(codes)) < p
    out[hit] = (out[hit] + rng.integers(1, 4, int(hit.sum()))) % 4
    return out.astype(np.uint8)


def fragment(rng, codes, contig_kb=15, keep=0.75):
    """Split into contigs, keep a random subset, concatenate — the shape
    of an incomplete assembly (drives AF below 1)."""
    step = contig_kb * 1000
    pieces = [codes[i : i + step] for i in range(0, len(codes), step)]
    kept = [p for p in pieces if rng.random() < keep]
    if not kept:
        kept = pieces[:1]
    return np.concatenate(kept)


def rearrange(rng, codes, seg_kb=40):
    """Shuffle large segments (chromosome rearrangement; chains break at
    segment boundaries but identity inside segments is untouched)."""
    step = seg_kb * 1000
    pieces = [codes[i : i + step] for i in range(0, len(codes), step)]
    order = rng.permutation(len(pieces))
    return np.concatenate([pieces[i] for i in order])


def main():
    genome_kb = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from gsearch_tpu.models.seedchain import SeedChainer
    from gsearch_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    chainer = SeedChainer(k=16, c=30)  # reference superani defaults

    rng = np.random.default_rng(0xA41)
    n_bases = genome_kb * 1000
    anis = [0.80, 0.84, 0.88, 0.90, 0.92, 0.95, 0.97, 0.98, 0.99, 0.995, 1.0]
    scenarios = ["clean", "fragmented", "rearranged", "frag+rearr"]
    rows = []
    for rep in range(reps):
        base = rng.integers(0, 4, n_bases).astype(np.uint8)
        r_sk = chainer.sketch(base)
        for true_ani in anis:
            for scen in scenarios:
                q = mutate(rng, base, 1.0 - true_ani)
                if "frag" in scen:
                    q = fragment(rng, q)
                if "rearr" in scen:
                    q = rearrange(rng, q)
                ani, afq, afr = chainer.compare(chainer.sketch(q), r_sk)
                rows.append({
                    "true": 100.0 * true_ani, "raw": ani,
                    "af": 0.5 * (afq + afr), "scenario": scen, "rep": rep,
                })
                log(f"rep{rep} {scen:>11} true={100*true_ani:6.2f} "
                    f"raw={ani:6.2f} af={0.5*(afq+afr):.3f}")

    raw = np.array([r["raw"] for r in rows])
    true = np.array([r["true"] for r in rows])
    af = np.array([r["af"] for r in rows])

    # piecewise-linear in raw ANI (two segments split at 95): the bias is
    # near-zero at high identity and grows toward 80%, so one global line
    # would trade high-identity accuracy for tail correction
    split = 95.0
    model = {"split": split, "segments": []}
    report = {"n_pairs": len(rows), "segments": []}
    for lo, hi in ((0.0, split), (split, 200.0)):
        sel = (raw >= lo) & (raw < hi)
        if sel.sum() < 4:
            coef = np.array([0.0, 1.0, 0.0])
        else:
            X = np.stack([np.ones(sel.sum()), raw[sel], af[sel]], 1)
            coef, *_ = np.linalg.lstsq(X, true[sel], rcond=None)
        model["segments"].append({
            "intercept": float(coef[0]), "ani": float(coef[1]),
            "af": float(coef[2]),
        })
        pred = coef[0] + coef[1] * raw[sel] + coef[2] * af[sel]
        err_raw = np.abs(raw[sel] - true[sel])
        err_fit = np.abs(pred - true[sel])
        report["segments"].append({
            "range": [lo, min(hi, 100.0)], "n": int(sel.sum()),
            "mae_raw": float(err_raw.mean()), "mae_fit": float(err_fit.mean()),
            "max_err_raw": float(err_raw.max()), "max_err_fit": float(err_fit.max()),
        })
        log(f"segment [{lo},{hi}): mae raw {err_raw.mean():.3f} -> "
            f"fit {err_fit.mean():.3f}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "gsearch_tpu", "models", "data",
                       "ani_regression_default.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(model, f, indent=1)
    report["rows"] = rows
    with open(os.path.join(here, "ANI_REGRESSION_FIT.json"), "w") as f:
        json.dump(report, f, indent=1)
    log(f"model -> {out}")


if __name__ == "__main__":
    main()
