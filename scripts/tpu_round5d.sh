#!/bin/bash
# Round-5 fourth TPU chain: re-measure after the host-merge gate
# removal + batch-epoch self-heal + compact thread records; land the
# joint10 capture (r5c attempt OOM'd before the self-heal existed).
# One TPU process at a time; no timeout wrappers (lease hygiene).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round5d}
mkdir -p "$OUT"

echo "=== joint calling: 10 samples (self-healing epochs)" | tee -a "$OUT/log"
MCTX_WATCHDOG=4500 python scripts/joint_call_10.py 4.6 10 10 > "$OUT/joint10.json" 2>> "$OUT/log"
tail -1 "$OUT/joint10.json" | tee -a "$OUT/log"

echo "=== perf lab 8: device merge engines at big shapes" | tee -a "$OUT/log"
MCTX_WATCHDOG=2700 python scripts/perf_lab8.py > "$OUT/lab8.json" 2>> "$OUT/log"
tail -1 "$OUT/lab8.json" | tee -a "$OUT/log"

echo "=== scale: 100Mb @ 5x (host gate off, device merges)" | tee -a "$OUT/log"
MCTX_WATCHDOG=7200 MCTX_BUILD_PROF=1 python scripts/scale_test.py 100 5 > "$OUT/scale_100mb.json" 2>> "$OUT/log"
tail -1 "$OUT/scale_100mb.json" | tee -a "$OUT/log"

echo "=== done $(date -u)" | tee -a "$OUT/log"
