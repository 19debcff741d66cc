"""Validate the hmmsearch engine against the GTDB marker profiles.

Runs only where the reference checkout is present (the 120 bacterial /
122 archaeal HMMER3 files under /root/reference/data are inputs, not
vendored).  Checks, per profile set:

  * every file parses to exactly one profile with finite match rows and
    calibrated STATS LOCAL VITERBI params,
  * specificity: random sequences score far below every GA cutoff,
  * sensitivity: each profile's consensus sequence (argmax match
    emission per node, embedded in random flanks) clears its own GA.

Usage: python scripts/validate_hmmsearch.py [hmm_dir] [n_profiles]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import os
import sys

import numpy as np


def main():
    hmm_dir = (sys.argv[1] if len(sys.argv) > 1
               else "/root/reference/data/HMM_bacteria")
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if not os.path.isdir(hmm_dir):
        print(f"skip: {hmm_dir} not present")
        return 0

    from gsearch_tpu.models.hmmprofile import (
        HMM_ALPHABET, HmmSearcher, parse_hmmer3)

    files = sorted(glob.glob(os.path.join(hmm_dir, "*.HMM")))
    profs = [p for f in files for p in parse_hmmer3(f)]
    assert len(profs) == len(files), "every file must parse to one profile"
    bad = [p.name for p in profs
           if not np.isfinite(p.match_logodds[1 : p.length + 1]).all()
           or not p.stats_vit or p.ga != p.ga]
    assert not bad, f"invalid profiles: {bad}"
    print(f"parsed {len(profs)} profiles, lengths "
          f"{min(p.length for p in profs)}-{max(p.length for p in profs)}")

    rng = np.random.default_rng(0)
    aas = list(HMM_ALPHABET)
    sub = profs[:limit]
    s = HmmSearcher(sub)

    rand_bits = s.score([s.encode("".join(rng.choice(aas, 350)))
                         for _ in range(4)])
    worst = float(rand_bits.max())
    min_ga = min(p.ga for p in sub)
    print(f"specificity: max random-seq bits {worst:.1f} vs min GA {min_ga:.1f}")
    assert worst < min_ga

    ok = 0
    for h, p in enumerate(sub):
        cons = "".join(HMM_ALPHABET[i]
                       for i in p.match_logodds[1 : p.length + 1].argmax(1))
        flank = "".join(rng.choice(aas, 40))
        b = float(s.score([s.encode(flank + cons + flank)])[h, 0])
        ok += b >= p.ga
        print(f"  {p.name:24s} L={p.length:4d} GA={p.ga:7.1f} "
              f"consensus={b:8.1f} {'ok' if b >= p.ga else 'FAIL'}")
    assert ok == len(sub), f"{len(sub) - ok} consensus sequences below GA"
    print(f"sensitivity: {ok}/{len(sub)} consensus sequences clear GA")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
