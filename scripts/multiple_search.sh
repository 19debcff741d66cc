#!/bin/bash
# Search every shard database and merge the answers (role of the
# reference's scripts/multiple_search.sh; merge = best distance per query
# across shards, "algorithmically equal" to one big index per the
# reference's todo.md item 3).
#
# Usage: multiple_search.sh <dbs_dir> <query_dir> <nb_answers> <out_dir>
set -euo pipefail
DBS=$1; QUERIES=$2; NB=$3; OUT=$4
mkdir -p "$OUT"
for d in "$DBS"/shard_*; do
    name=$(basename "$d")
    echo "== searching $name =="
    mkdir -p "$OUT/$name"
    python -m gsearch_tpu request -b "$d" -n "$NB" -r "$QUERIES" -o "$OUT/$name"
done
# merge: concatenate per-shard answers and keep the best NB per query
python - "$OUT" "$NB" <<'EOF'
import sys, os, glob, re
out_dir, nb = sys.argv[1], int(sys.argv[2])
per_query = {}
for f in glob.glob(os.path.join(out_dir, "shard_*", "gsearch.neighbors.txt")):
    for line in open(f):
        if line.startswith("query_id:"):
            parts = line.rstrip("\n").split("\t")
            q, dist = parts[1], float(parts[3])
            per_query.setdefault(q, []).append((dist, line.rstrip("\n")))
with open(os.path.join(out_dir, "gsearch.neighbors.merged.txt"), "w") as out:
    for q in sorted(per_query):
        for dist, line in sorted(per_query[q])[:nb]:
            out.write(line + "\n")
print(f"merged {len(per_query)} queries -> {out_dir}/gsearch.neighbors.merged.txt")
EOF
