"""hnswcore equivalent: coreset extraction / clustering of a database.

CLI parity with the reference binary (reference:
binaux/src/bin/hnswcore.rs:291-465 — reload a dumped database by its
self-describing type, sample distance quantiles, build a coreset and
optionally cluster it, writing coreset.csv / clustercoreset.csv).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_hnswcore(db_dir: str, nb_coreset: int, nb_cluster: int, out_dir: str,
                 metric: str = "hamming") -> dict:
    from ..analysis.coreset import (build_coreset, cluster_coreset, distance_quantiles,
                                    dump_cluster_csv, dump_coreset_csv)
    from ..core import SeqDict
    from ..index.serialize import load_index

    index = load_index(db_dir)
    seqdict = SeqDict.reload_json(db_dir)
    sigs = index.get_sigs()
    q = distance_quantiles(sigs, metric=metric)
    print(f"sampled distance quantiles: {json.dumps(q)}", file=sys.stderr)

    core = build_coreset(sigs, nb_coreset, metric=metric)
    dump_coreset_csv(core, seqdict, os.path.join(out_dir, "coreset.csv"))
    out = {"quantiles": q, "coreset_size": len(core.ids), "coreset_cost": core.cost}
    if nb_cluster > 0:
        clus = cluster_coreset(sigs, core, nb_cluster, metric=metric)
        dump_cluster_csv(clus, seqdict, os.path.join(out_dir, "clustercoreset.csv"))
        out["nb_cluster"] = len(clus.ids)
        out["cluster_cost"] = clus.cost
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hnswcore",
                                 description="coreset clustering of a sketch database")
    ap.add_argument("-b", "--hnsw", required=True, dest="db_dir")
    ap.add_argument("--coreset", type=int, default=256, help="coreset size")
    ap.add_argument("--cluster", type=int, default=0, help="clusters (0 = coreset only)")
    ap.add_argument("-o", "--out", default=".", help="output directory")
    ap.add_argument("--metric", default="hamming",
                    choices=["hamming", "l1", "l2", "cosine"],
                    help="distance for sampling/assignment (reference "
                         "hnswcore dispatches the same set, hnswcore.rs:432-462)")
    args = ap.parse_args(argv)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    res = run_hnswcore(args.db_dir, args.coreset, args.cluster, args.out,
                       metric=args.metric)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
