#!/bin/bash
# Sequential on-chip measurement battery (ONE TPU process at a time).
# Usage: bash scripts/run_tpu_battery.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
  timeout 2400 python -u "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S) ===" | tee -a "$OUT/summary.log"
  tail -25 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

run bench bench.py
run stages scripts/bench_train_stages.py
run window scripts/bench_window_stages.py
run compaction scripts/bench_compaction.py
echo "battery done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
