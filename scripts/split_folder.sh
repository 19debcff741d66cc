#!/bin/bash
# Split a genome directory into N roughly equal sub-folders for sharded
# builds (role of the reference's scripts/split_folder.sh — the offline
# path; the first-class alternative is jax.sharding in
# gsearch_tpu/parallel/mesh.py, which shards one index over a device mesh).
#
# Usage: split_folder.sh <genome_dir> <n_shards> <out_dir>
set -euo pipefail
SRC=$1; N=$2; OUT=$3
mkdir -p "$OUT"
i=0
find "$SRC" -maxdepth 1 -type f \
    \( -name '*.fna*' -o -name '*.fa*' -o -name '*.fasta*' \) | sort | \
while read -r f; do
    shard=$((i % N))
    mkdir -p "$OUT/shard_$shard"
    ln -sf "$(readlink -f "$f")" "$OUT/shard_$shard/"
    i=$((i + 1))
done
echo "split $(find "$SRC" -maxdepth 1 -type f | wc -l) files into $N shards under $OUT"
