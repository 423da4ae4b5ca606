#!/bin/bash
# Round-4 TPU measurement chain (run when the axon tunnel is up).
# One TPU process at a time; no timeout wrappers (lease hygiene).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round4}
mkdir -p "$OUT"

echo "=== bench" | tee -a "$OUT/log"
python bench.py > "$OUT/bench.json" 2>> "$OUT/log"
cat "$OUT/bench.json" | tee -a "$OUT/log"

echo "=== scale: E.coli 4.6Mb @ 20x (with build-phase breakdown)" | tee -a "$OUT/log"
MCTX_BUILD_PROF=1 python scripts/scale_test.py 4.6 20 > "$OUT/scale_ecoli.json" 2>> "$OUT/log"
cat "$OUT/scale_ecoli.json" | tee -a "$OUT/log"

echo "=== perf lab6 (merge kernels, join lookup, h2d)" | tee -a "$OUT/log"
python scripts/perf_lab6.py 2>> "$OUT/log"

echo "=== scale: 100Mb @ 5x" | tee -a "$OUT/log"
python scripts/scale_test.py 100 5 > "$OUT/scale_100mb.json" 2>> "$OUT/log"
cat "$OUT/scale_100mb.json" | tee -a "$OUT/log"

echo "=== scale: bubbles (E.coli joint graph)" | tee -a "$OUT/log"
python scripts/scale_bubbles.py > "$OUT/scale_bubbles.json" 2>> "$OUT/log"
cat "$OUT/scale_bubbles.json" | tee -a "$OUT/log"

echo "=== done $(date -u)" | tee -a "$OUT/log"
