#!/bin/bash
# Round-5 third TPU chain: land the outstanding captures.  The r5b
# chain died with its driver session after bench (joint10 never ran);
# its scale_ecoli correct-warm row (1881s) was an axon outage mid-run
# (ROUND5.md #12 failure mode), so re-measure that too.
# One TPU process at a time; no timeout wrappers (lease hygiene).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache
OUT=${1:-/tmp/tpu_round5c}
mkdir -p "$OUT"

echo "=== joint calling: 10 samples E.coli-scale" | tee -a "$OUT/log"
MCTX_WATCHDOG=4500 python scripts/joint_call_10.py 4.6 10 10 > "$OUT/joint10.json" 2>> "$OUT/log"
tail -1 "$OUT/joint10.json" | tee -a "$OUT/log"

echo "=== scale: 100Mb @ 5x completed wall-clock" | tee -a "$OUT/log"
MCTX_WATCHDOG=5400 MCTX_BUILD_PROF=1 python scripts/scale_test.py 100 5 > "$OUT/scale_100mb.json" 2>> "$OUT/log"
tail -1 "$OUT/scale_100mb.json" | tee -a "$OUT/log"

echo "=== scale: E.coli 4.6Mb @ 20x re-measure (correct/thread rows)" | tee -a "$OUT/log"
MCTX_WATCHDOG=3600 MCTX_BUILD_PROF=1 python scripts/scale_test.py 4.6 20 > "$OUT/scale_ecoli.json" 2>> "$OUT/log"
tail -1 "$OUT/scale_ecoli.json" | tee -a "$OUT/log"

echo "=== done $(date -u)" | tee -a "$OUT/log"
