"""bigsig equivalent: BIGSI construct + identify.

CLI parity with the reference binary (reference:
binaux/src/bin/bigsig.rs:193-341 — `construct` builds the bit-sliced Bloom
index over a genome directory in k-mer or minimizer mode with
--bloom/--hashes/--kmer flags; `identify` streams reads against it and
reports per-read genome hits with FP correction; summary counts like
reports::read_counts_five_fields).
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter


def cmd_construct(args) -> int:
    from ..index.bigsi import BigsiIndex
    from ..io.fasta import concat_file_codes
    from ..io.walk import walk_fasta_dir

    idx = BigsiIndex(
        bloom_len=args.bloom,
        nb_hashes=args.hashes,
        kmer_size=args.kmer,
        minimizer_window=args.minimizer,
    )
    paths = walk_fasta_dir(args.refs)
    if not paths:
        print(f"no FASTA under {args.refs}", file=sys.stderr)
        return 1
    for p in paths:
        codes, _, total = concat_file_codes(p)
        if total == 0:
            continue
        idx.insert_genome(p, codes)
        print(f"inserted {p} ({total} bases)", file=sys.stderr)
    idx.save(args.bigsi)
    print(f"saved index over {idx.nb_genomes} genomes to {args.bigsi}.bigsi.npz")
    return 0


def cmd_identify(args) -> int:
    import numpy as np

    from ..index.bigsi import BigsiIndex
    from ..io.codec import encode_dna
    from ..io.fasta import parse_reads

    idx = BigsiIndex.load(args.bigsi)
    read_len = args.read_len
    batch = args.batch
    paired = len(args.reads) == 2
    names, buf, buf2 = [], [], []
    summary = Counter()
    frac_sum = Counter()
    nb_reads = 0
    out_path = args.output + "_reads.txt"
    out = open(out_path, "w")
    out.write("read_id\tgenome\thits\ttotal_kmers\tcorrected_fraction\n")

    def to_codes(seq: bytes) -> np.ndarray:
        codes = encode_dna(seq)
        if len(codes) < read_len:
            codes = np.pad(codes, (0, read_len - len(codes)), constant_values=255)
        return codes[:read_len]

    def flush():
        nonlocal nb_reads
        if not buf:
            return
        counts, totals = idx.raw_counts(np.stack(buf), down_sample=args.down_sample)
        if buf2:
            # paired-end: sum both mates' evidence before scoring
            # (reference: per_read_stream_pe, bigsig.rs:382-397)
            c2, t2 = idx.raw_counts(np.stack(buf2), down_sample=args.down_sample)
            counts, totals = counts + c2, totals + t2
        scored = idx.score_counts(counts, totals,
                                  min_fraction=args.min_fraction,
                                  fp_exponent=args.fp_correct)
        for rid, hits in zip(names, scored):
            nb_reads += 1
            if hits:
                for name, h, t, frac in hits[: args.max_hits]:
                    out.write(f"{rid}\t{name}\t{h}\t{t}\t{frac:.4f}\n")
                summary[hits[0][0]] += 1
                frac_sum[hits[0][0]] += hits[0][3]
            else:
                summary["<unclassified>"] += 1
        names.clear()
        buf.clear()
        buf2.clear()

    streams = [parse_reads(p, quality_min=args.quality) for p in args.reads]
    if paired:
        for r1, r2 in zip(*streams):
            buf.append(to_codes(r1.seq))
            buf2.append(to_codes(r2.seq))
            names.append(r1.fasta_id)
            if len(buf) >= batch:
                flush()
    else:
        for rec in streams[0]:
            buf.append(to_codes(rec.seq))
            names.append(rec.fasta_id)
            if len(buf) >= batch:
                flush()
    flush()
    out.close()

    # five-field per-genome summary (reference:
    # reports::read_counts_five_fields, bigsig.rs:507)
    counts_path = args.output + "_counts.txt"
    with open(counts_path, "w") as cf:
        cf.write("genome\treads\tpct_of_reads\tavg_top_fraction\tkind\n")
        for name, c in summary.most_common():
            kind = "unclassified" if name == "<unclassified>" else "genome"
            avg = frac_sum[name] / c if c and name in frac_sum else 0.0
            cf.write(f"{name}\t{c}\t{100.0 * c / max(nb_reads, 1):.2f}\t"
                     f"{avg:.4f}\t{kind}\n")
    mode = "paired-end" if paired else "single-end"
    print(f"classified {nb_reads} {mode} reads -> {out_path}, {counts_path}")
    for name, c in summary.most_common(10):
        print(f"  {name}: {c}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bigsig", description="BIGSI build & read classification")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("construct")
    c.add_argument("-r", "--refs", required=True, help="directory of reference FASTA")
    c.add_argument("-b", "--bigsi", required=True, help="output index prefix")
    c.add_argument("--bloom", type=int, default=25_000_000,
                   help="bloom filter length; use >= ~4x the largest genome's "
                        "distinct k-mer count to keep fill (and FP correction) low")
    c.add_argument("--hashes", type=int, default=2, help="hash functions")
    c.add_argument("-k", "--kmer", type=int, default=21)
    c.add_argument("-m", "--minimizer", type=int, default=0, help="minimizer window (0=off)")

    i = sub.add_parser("identify")
    i.add_argument("-b", "--bigsi", required=True, help="index prefix")
    i.add_argument("-q", "--reads", required=True, nargs="+",
                   help="reads FASTA/FASTQ(.gz/.xz/.bz2/.zst); two files = "
                        "paired-end (reference: bigsig.rs:122-125)")
    i.add_argument("-o", "--output", default="bigsig",
                   help="output prefix -> <prefix>_reads.txt + <prefix>_counts.txt")
    i.add_argument("--read_len", type=int, default=256)
    i.add_argument("--batch", type=int, default=4096)
    i.add_argument("--min_fraction", type=float, default=0.7)
    i.add_argument("--max_hits", type=int, default=5)
    i.add_argument("-d", "--down_sample", type=int, default=1,
                   help="probe every Nth k-mer (reference: bigsig.rs:154-160)")
    i.add_argument("-c", "--fp_correct", type=float, default=0.0,
                   help="also require binomial P(hits|FP) < 10^-VALUE "
                        "(reference default 3.0, bigsig.rs:168-175; 0 = off)")
    i.add_argument("-Q", "--quality", type=int, default=15,
                   help="mask FASTQ bases with phred < VALUE "
                        "(reference: bigsig.rs:176-182)")

    args = ap.parse_args(argv)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    return cmd_construct(args) if args.cmd == "construct" else cmd_identify(args)


if __name__ == "__main__":
    raise SystemExit(main())
