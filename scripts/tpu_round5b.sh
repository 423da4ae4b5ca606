#!/bin/bash
# Round-5 second TPU chain: re-measure after the lazy-merge /
# walk-transfer / thread-jit / tile-512 fixes, root-cause the C=10
# compile crash, and land the outstanding captures (joint calling,
# 100Mb completed wall-clock, chained-lookup bench).
# One TPU process at a time; no timeout wrappers (lease hygiene).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round5b}
mkdir -p "$OUT"

echo "=== probe: which C=10 program kills the compiler" | tee -a "$OUT/log"
python scripts/probe_c10.py > "$OUT/probe_c10.json" 2>> "$OUT/log"
cat "$OUT/probe_c10.json" | tee -a "$OUT/log"

echo "=== scale: E.coli 4.6Mb @ 20x (lazy merges + transfer fixes)" | tee -a "$OUT/log"
MCTX_BUILD_PROF=1 python scripts/scale_test.py 4.6 20 > "$OUT/scale_ecoli.json" 2>> "$OUT/log"
tail -1 "$OUT/scale_ecoli.json" | tee -a "$OUT/log"

echo "=== bench (chained lookups, tile-512 front-end)" | tee -a "$OUT/log"
python bench.py > "$OUT/bench.json" 2>> "$OUT/log"
tail -1 "$OUT/bench.json" | tee -a "$OUT/log"

echo "=== joint calling: 10 samples E.coli-scale (self-healing merges)" | tee -a "$OUT/log"
MCTX_WATCHDOG=4500 python scripts/joint_call_10.py 4.6 10 10 > "$OUT/joint10.json" 2>> "$OUT/log"
tail -1 "$OUT/joint10.json" | tee -a "$OUT/log"

echo "=== scale: 100Mb @ 5x (wider watchdog; programs now cached)" | tee -a "$OUT/log"
MCTX_WATCHDOG=5400 MCTX_BUILD_PROF=1 python scripts/scale_test.py 100 5 > "$OUT/scale_100mb.json" 2>> "$OUT/log"
tail -1 "$OUT/scale_100mb.json" | tee -a "$OUT/log"

echo "=== done $(date -u)" | tee -a "$OUT/log"
