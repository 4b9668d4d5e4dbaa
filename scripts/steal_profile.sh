#!/bin/bash
# Steal-aware profiling: runs profile_queries.py and brackets it with
# /proc/stat steal readings so a steal-polluted window is visible.
# Usage: steal_profile.sh <repo_dir> <query> [query ...]
repo="$1"; shift
s0=$(awk '/^cpu /{print $9}' /proc/stat)
t0=$(date +%s)
cd "$repo" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_REPS=${REPS:-3} python scripts/profile_queries.py "$@" 2>/dev/null
s1=$(awk '/^cpu /{print $9}' /proc/stat)
t1=$(date +%s)
# steal jiffies per elapsed second (32 cpus -> 3200 jiffies/s total)
echo "STEAL: $((s1-s0)) jiffies over $((t1-t0))s (pct of capacity: $(( (s1-s0) / (32 * (t1-t0) + 1) ))%)"
