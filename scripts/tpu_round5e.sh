#!/bin/bash
# Round-5 final TPU chain: diploid 1Mb recipe (BASELINE configs 3-4)
# and a bench pass that leaves the compilation cache hot for the
# driver's end-of-round BENCH_r05 capture.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round5e}
mkdir -p "$OUT"

echo "=== joint calling: 10 samples (split ladder + residency soft cap)" | tee -a "$OUT/log"
MCTX_WATCHDOG=4500 python scripts/joint_call_10.py 4.6 10 10 > "$OUT/joint10.json" 2>> "$OUT/log"
tail -1 "$OUT/joint10.json" | tee -a "$OUT/log"

echo "=== diploid 1Mb breakpoints+genotyping (configs 3-4)" | tee -a "$OUT/log"
MCTX_WATCHDOG=4200 python scripts/diploid_scale.py 1.0 /tmp/mctx_diploid > "$OUT/diploid.json" 2>> "$OUT/log"
tail -1 "$OUT/diploid.json" | tee -a "$OUT/log"

echo "=== bench (driver-protocol; primes the cache)" | tee -a "$OUT/log"
python bench.py > "$OUT/bench.json" 2>> "$OUT/log"
tail -1 "$OUT/bench.json" | tee -a "$OUT/log"

echo "=== done $(date -u)" | tee -a "$OUT/log"
