#!/usr/bin/env bash
# Cold-start guard (VERDICT r4 #7): verifies `python bench.py` completes
# within the driver's budget from a COLD persistent compile cache.
#
# Round-4 postmortem: a fused-MLP commit landed in the final hour, changed
# every step's HLO, invalidated the persistent XLA cache, and the driver's
# cold `python bench.py` timed out (rc=124) — the round lost its official
# benchmark. RULE (BUILD_NOTES round 5): any change that touches step HLO
# (models/, ops/, engine/model_runner.py dispatch path) re-runs this script
# before it ships.
#
# Usage: tools/cold_start_check.sh [budget_secs] [bench args...]
set -u
BUDGET="${1:-420}"
shift 2>/dev/null || true
CACHE="${NANOVLLM_XLA_CACHE:-$HOME/.cache/nanovllm_tpu_xla}"
STAMP="$(date +%s)"

if [ -d "$CACHE" ]; then
  mv "$CACHE" "$CACHE.bak.$STAMP"
  echo "cold_start_check: moved warm cache aside -> $CACHE.bak.$STAMP" >&2
fi

START=$(date +%s)
python bench.py --max-warmup-secs "$BUDGET" "$@"
RC=$?
ELAPSED=$(( $(date +%s) - START ))

if [ $RC -ne 0 ]; then
  echo "cold_start_check: FAIL rc=$RC after ${ELAPSED}s (budget ${BUDGET}s)" >&2
  exit $RC
fi
if [ $ELAPSED -gt $BUDGET ]; then
  echo "cold_start_check: FAIL total wall ${ELAPSED}s > budget ${BUDGET}s" >&2
  exit 4
fi
echo "cold_start_check: OK — cold end-to-end ${ELAPSED}s (budget ${BUDGET}s)" >&2
