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
    from ..io.fasta import parse_fasta

    idx = BigsiIndex.load(args.bigsi)
    read_len = args.read_len
    batch = args.batch
    names, buf = [], []
    summary = Counter()
    nb_reads = 0
    out = open(args.output, "w")
    out.write("read_id\tgenome\thits\ttotal_kmers\tcorrected_fraction\n")

    def flush():
        nonlocal nb_reads
        if not buf:
            return
        reads = np.stack(buf)
        for rid, hits in zip(names, idx.classify(reads, min_fraction=args.min_fraction)):
            nb_reads += 1
            if hits:
                for name, h, t, frac in hits[: args.max_hits]:
                    out.write(f"{rid}\t{name}\t{h}\t{t}\t{frac:.4f}\n")
                summary[hits[0][0]] += 1
            else:
                summary["<unclassified>"] += 1
        names.clear()
        buf.clear()

    for rec in parse_fasta(args.reads):
        codes = encode_dna(rec.seq)
        # fixed-shape batching: pad/truncate to read_len
        if len(codes) < read_len:
            codes = np.pad(codes, (0, read_len - len(codes)), constant_values=255)
        buf.append(codes[:read_len])
        names.append(rec.fasta_id)
        if len(buf) >= batch:
            flush()
    flush()
    out.close()
    print(f"classified {nb_reads} reads -> {args.output}")
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
    i.add_argument("-q", "--reads", required=True, help="reads FASTA")
    i.add_argument("-o", "--output", default="bigsig.out")
    i.add_argument("--read_len", type=int, default=256)
    i.add_argument("--batch", type=int, default=4096)
    i.add_argument("--min_fraction", type=float, default=0.7)
    i.add_argument("--max_hits", type=int, default=5)

    args = ap.parse_args(argv)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    return cmd_construct(args) if args.cmd == "construct" else cmd_identify(args)


if __name__ == "__main__":
    raise SystemExit(main())
