#!/bin/bash
# Round-5 chain E — tail consumer after chainD's deadline (16:05 UTC).
# chainD's own tail gates will likely fail on its expired budget after
# the host-arm restarts ate the morning; this chain spends the last TPU
# hour on (1) the bench zoo — which also re-seeds the XLA compile cache
# for the driver's end-of-round BENCH run after the round's source edits
# invalidated it — then (2) as many 15k matrix cells as fit, then (3) a
# fresh step trace at HEAD defaults for the copy-family table.
set -x
cd /root/repo
mkdir -p model
START=$(date +%s)
DEADLINE=${CHAIN_DEADLINE:-$((START + 5400))}
D_PID=${CHAIN_D_PID:?need CHAIN_D_PID}
left() { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 "$D_PID" 2>/dev/null; do
  if [ "$(left)" -lt 300 ]; then echo "deadline while waiting for D"; exit 1; fi
  sleep 60
done

run_watch() {  # <logfile> <timeout_s> <stale_s> <cmd...>
  local log=$1 tmo=$2 stale=$3; shift 3
  local lft; lft=$(left)
  if [ "$lft" -lt 240 ]; then return 1; fi
  if [ "$tmo" -gt "$lft" ]; then tmo=$lft; fi
  timeout "$tmo" "$@" > "$log.e" 2> "$log.e.err" &
  local tpid=$!
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 60
    local now m
    now=$(date +%s)
    m=$(stat -c %Y "$log.e" 2>/dev/null || echo "$now")
    if [ $((now - m)) -gt "$stale" ]; then
      echo "stale ${stale}s, killing" >> "$log.e.err"
      pkill -P "$tpid"
      sleep 5
      kill "$tpid" 2>/dev/null
      break
    fi
  done
  wait "$tpid"
  cat "$log.e" >> "$log" 2>/dev/null
  cat "$log.e.err" >> "$log.err" 2>/dev/null
}

# ---- 1. bench zoo (fs24 default row first; seeds the compile cache) ---
if ! grep -qs 'fs24_head_default' model/r5_bench_multi.json 2>/dev/null; then
  BENCH_MULTI_OUT=model/r5_bench_multi.json \
    run_watch model/r5_bench_tail.log 3600 1200 python scripts/bench_multi.py
fi

# ---- 2. matrix cells, fold-major so a cut leaves balanced coverage ----
for fold in fold1 fold2 fold3 fold4 fold5; do
  for m in pce dmpls; do
    if [ "$(left)" -gt 1800 ]; then
      run_watch "model/r5_matrix_${m}_${fold}.log" 1700 900 \
        python scripts/launch_experiments.py --methods "$m" --folds "$fold" \
          --extra "--max_iterations 15000 --steps_per_call 20 --resume --val_every 500 --snapshot_root model/r5_matrix"
    fi
  done
done

# ---- 3. fresh trace at HEAD defaults ----------------------------------
if [ "$(left)" -gt 700 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r5tail \
    run_watch model/r5_trace_tail.log 1100 900 python scripts/capture_trace.py
fi

echo CHAIN_R5E_DONE
