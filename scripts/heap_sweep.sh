#!/bin/bash
# Constrained-heap regression gate: run the registry's heaviest rows at
# the 100x tier inside a 4 GB heap (local[32] => ~128 MB/core) and FAIL
# on any OOM / GC-overhead / failed-attempt evidence. Productizes the
# round-12 "spill, don't crash" sweep (SCALE.md) so the property is a
# repeatable gate, not a one-time measurement.
#
# Usage:
#   bash scripts/heap_sweep.sh                 # default row set
#   bash scripts/heap_sweep.sh q1,q2,...       # explicit row set
#   HEAP=4g MULT=100 bash scripts/heap_sweep.sh
#
# Layout note (round-12 lesson): the sweep stages the KEY-OFFSET
# rehearsal, not verbatim replication — verbatim duplicates orderkeys
# on both join sides, inflating orders-joins ~N^2 and measuring the
# layout artifact, not the engine (that layout kills a 4 GB JVM in the
# spill WRITER, which local mode cannot poison).
set -u
cd "$(dirname "$0")/.."

HEAP="${HEAP:-4g}"
MULT="${MULT:-100}"
STAGE_DIR="${STAGE_DIR:-/tmp/sfjoin${MULT}}"
ROWS="${1:-graph_kcore,corpus_overlap_matrix,sim_topk_ivfpq_gate,stream_attribution_daily,dedup_embedding_lsh,dedup_minhash_corpus,graph_edges_incremental,graph_hits_serve,manifest_merge_rows,manifest_delete_rows}"

if [ ! -d "$STAGE_DIR/lineitem.parquet" ]; then
  echo "[heap_sweep] staging ${MULT}x key-offset rehearsal at $STAGE_DIR"
  python3 scripts/stage_join_rehearsal.py "$MULT" "$STAGE_DIR" || exit 2
fi

LOG="$(mktemp /tmp/heap_sweep_XXXX.log)"
echo "[heap_sweep] rows=$ROWS heap=$HEAP data=$STAGE_DIR log=$LOG"
SPARK_GRAFT_SF_DIR="$STAGE_DIR" SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM="$HEAP" SPARK_GRAFT_REPEATS="${REPEATS:-1}" \
  SPARK_GRAFT_ONLY="$ROWS" SPARK_GRAFT_BENCH_OUT=/tmp/heap_sweep_bench.json \
  bash scripts/run_class.sh graft.Bench >"$LOG.out" 2>"$LOG"
RC=$?

FAIL=0
if [ $RC -ne 0 ]; then
  echo "[heap_sweep] FAIL: Bench JVM exited rc=$RC (an executor-thread"
  echo "  OOM kills the SparkContext before Bench can poison the row)"
  FAIL=1
fi
# OutOfMemoryError / GC overhead anywhere in the log = the heap did not
# spill-degrade; failed attempts in the artifact = a row died quietly.
if grep -qE "OutOfMemoryError|GC overhead limit" "$LOG"; then
  echo "[heap_sweep] FAIL: OOM/GC-overhead evidence in $LOG:"
  grep -E "OutOfMemoryError|GC overhead limit" "$LOG" | head -5
  FAIL=1
fi
if grep -q "attempt failed" "$LOG"; then
  echo "[heap_sweep] FAIL: failed attempts in $LOG:"
  grep "attempt failed" "$LOG" | head -5
  FAIL=1
fi
HEADLINE="$(tail -1 "$LOG.out")"
ERRS=$(printf '%s' "$HEADLINE" | python3 -c 'import json,sys
try: print(json.load(sys.stdin).get("err_attempts", -1))
except Exception: print(-1)')
if [ "$ERRS" != "0" ]; then
  echo "[heap_sweep] FAIL: err_attempts=$ERRS in headline"
  FAIL=1
fi

echo "[heap_sweep] per-query seconds (for the SCALE.md table):"
printf '%s\n' "$HEADLINE" | python3 -c 'import json,sys
d=json.load(sys.stdin)
for k,v in sorted(d.get("queries",{}).items(), key=lambda kv:-kv[1]):
    print(f"  {k}: {v:.2f} s")'

if [ $FAIL -eq 0 ]; then
  echo "[heap_sweep] PASS: zero OOM, zero failed attempts at $HEAP / ${MULT}x"
fi
exit $FAIL
