#!/bin/bash
# Round-5 TPU measurement chain (run when the axon tunnel is up).
# One TPU process at a time; no timeout wrappers (lease hygiene).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round5}
mkdir -p "$OUT"

echo "=== bench (incremental-emit protocol)" | tee -a "$OUT/log"
python bench.py > "$OUT/bench.json" 2>> "$OUT/log"
tail -1 "$OUT/bench.json" | tee -a "$OUT/log"

echo "=== scale: E.coli 4.6Mb @ 20x (packed H2D + all phases)" | tee -a "$OUT/log"
MCTX_BUILD_PROF=1 python scripts/scale_test.py 4.6 20 > "$OUT/scale_ecoli.json" 2>> "$OUT/log"
cat "$OUT/scale_ecoli.json" | tee -a "$OUT/log"

echo "=== joint calling: 10 samples E.coli-scale" | tee -a "$OUT/log"
python scripts/joint_call_10.py 4.6 10 10 > "$OUT/joint10.json" 2>> "$OUT/log"
cat "$OUT/joint10.json" | tee -a "$OUT/log"

echo "=== perf lab 7 (RPC-free stage split, FE tile A/B)" | tee -a "$OUT/log"
python scripts/perf_lab7.py > "$OUT/lab7.json" 2>> "$OUT/log"
cat "$OUT/lab7.json" | tee -a "$OUT/log"

echo "=== scale: 100Mb @ 5x (completed wall-clock capture)" | tee -a "$OUT/log"
MCTX_BUILD_PROF=1 python scripts/scale_test.py 100 5 > "$OUT/scale_100mb.json" 2>> "$OUT/log"
cat "$OUT/scale_100mb.json" | tee -a "$OUT/log"

echo "=== bench retry (in case the tunnel recovered late)" | tee -a "$OUT/log"
if ! grep -q '"value": [1-9]' "$OUT/bench.json" 2>/dev/null; then
  python bench.py > "$OUT/bench2.json" 2>> "$OUT/log"
  tail -1 "$OUT/bench2.json" | tee -a "$OUT/log"
fi

echo "=== done $(date -u)" | tee -a "$OUT/log"
