"""hmmsearch equivalent: score protein sequences against HMMER3 profiles.

Parity target: the reference's hmmsearch_rs companion binary (reference:
README.md:353-374 — `hmmsearch_rs -f proteome.faa -m profile.HMM
[-o out]`, tabular output), used to extract the 120/122 GTDB universal
marker genes (data/HMM_bacteria, data/HMM_archaea) that the AA /
universal-gene databases index (README.md:656-660).

Extensions over the reference tool: -m accepts a DIRECTORY of .HMM files
(all 120 profiles score in one batched device pass), --cut_ga applies each
profile's gathering cutoff, -E filters by E-value.
"""

from __future__ import annotations

import argparse
import os
import sys


def _iter_hmm_files(path: str):
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.upper().endswith((".HMM", ".H3M")):
                yield os.path.join(path, name)
    else:
        yield path


def run_hmmsearch(faa: str, hmm: str, output: str | None = None,
                  cut_ga: bool = False, e_max: float | None = None) -> int:
    import numpy as np

    from ..io.fasta import parse_fasta
    from ..models.hmmprofile import HmmSearcher, parse_hmmer3

    profiles = []
    for f in _iter_hmm_files(hmm):
        profiles.extend(parse_hmmer3(f))
    if not profiles:
        print(f"no HMMER3 profiles found under {hmm}", file=sys.stderr)
        return 1

    names, seqs = [], []
    for rec in parse_fasta(faa):
        names.append(rec.fasta_id)
        seqs.append(HmmSearcher.encode(rec.seq.decode(errors="replace")))
    if not seqs:
        print(f"no sequences in {faa}", file=sys.stderr)
        return 1

    searcher = HmmSearcher(profiles)
    # real hmmsearch reports Forward bit scores and applies GA cutoffs to
    # them (p7_Pipeline); the Viterbi score rides along as vit_bits
    bits = searcher.score(seqs, algo="forward")
    vbits = searcher.score(seqs, algo="viterbi")
    ev = searcher.evalues(bits, n_targets=len(seqs), algo="forward")
    if np.isnan(ev).all():  # uncalibrated profiles: fall back to Viterbi tail
        ev = searcher.evalues(vbits, n_targets=len(seqs), algo="viterbi")

    out = open(output, "w") if output else sys.stdout
    try:
        print("# seq_name\thmm_name\thmm_acc\tbits\tvit_bits\tevalue\tga_pass",
              file=out)
        n_rows = 0
        for h, p in enumerate(profiles):
            order = sorted(range(len(seqs)), key=lambda i: -bits[h, i])
            for i in order:
                b = float(bits[h, i])
                vb = float(vbits[h, i])
                e = float(ev[h, i])
                gp = "-" if p.ga != p.ga else ("1" if b >= p.ga else "0")
                if cut_ga and gp != "1":
                    continue
                if e_max is not None and e == e and e > e_max:
                    continue
                print(f"{names[i]}\t{p.name}\t{p.acc}\t{b:.1f}\t{vb:.1f}\t"
                      f"{e:.3g}\t{gp}", file=out)
                n_rows += 1
        print(f"wrote {n_rows} rows ({len(profiles)} profiles x "
              f"{len(seqs)} seqs)", file=sys.stderr)
    finally:
        if output:
            out.close()
    return 0


def add_parser(sub):
    p = sub.add_parser("hmmsearch",
                       help="score proteins against HMMER3 profiles "
                            "(hmmsearch_rs role)")
    p.add_argument("-f", "--faa", required=True,
                   help="protein FASTA (.faa) file")
    p.add_argument("-m", "--hmm", required=True,
                   help="HMMER3 profile file OR directory of .HMM files")
    p.add_argument("-o", "--output", default=None,
                   help="output TSV (default stdout)")
    p.add_argument("--cut_ga", action="store_true",
                   help="keep only hits above each profile's GA cutoff")
    p.add_argument("-E", type=float, default=None, dest="e_max",
                   help="maximum E-value")
    return p


def main(argv=None):
    ap = argparse.ArgumentParser("hmmsearch")
    ap.add_argument("-f", "--faa", required=True)
    ap.add_argument("-m", "--hmm", required=True)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--cut_ga", action="store_true")
    ap.add_argument("-E", type=float, default=None, dest="e_max")
    a = ap.parse_args(argv)
    return run_hmmsearch(a.faa, a.hmm, a.output, a.cut_ga, a.e_max)


if __name__ == "__main__":
    raise SystemExit(main())
