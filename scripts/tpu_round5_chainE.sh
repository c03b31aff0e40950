#!/bin/bash
# Round-5 chain E (v2) — tail consumer after chainD. Priorities for the
# last TPU window: (1) bench zoo — also re-seeds the XLA compile cache
# for the driver's end-of-round BENCH run after today's source edits
# invalidated it; (2) USTM fold1 (VERDICT item 9's second half — chainD's
# remaining budget cannot reach its gate), tested with the newest
# periodic checkpoint if 60k doesn't complete; (3) s2l guard if chainD
# dropped it; (4) fold-major matrix cells; (5) fresh HEAD trace.
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

# ---- 2. USTM fold1 (resume-capable; partial run still gets tested) ----
UDIR=model/ACDC/pCE_Seg_USTM_fold1/scribble
if [ ! -f "$UDIR/iter_60000.pth" ] && [ "$(left)" -gt 1500 ]; then
  run_watch model/r5_ustm.log $(( $(left) - 900 )) 1200 \
    python scripts/train_weakly_supervised_ustm_2D.py --fold fold1 \
      --steps_per_call 20 --ckpt_every 3000 --resume
fi
if [ -f "$UDIR/iter_60000.pth" ]; then
  UCP=iter_60000.pth
else
  UCP=$(ls -t "$UDIR"/iter_*.pth 2>/dev/null | grep -v dice | head -1 | xargs -r basename)
fi
if [ -n "$UCP" ] && [ "$(left)" -gt 700 ]; then
  run_watch model/r5_ustm_test.log 1500 900 python \
    scripts/test_2D_fully.py --exp ACDC/pCE_Seg_USTM --fold fold1 \
    --checkpoint "$UCP" --no_save
fi

# ---- 3. s2l guard (skipped instantly when chainD finished it) ---------
SDIR=model/ACDC/pCE_scribble2label_fold1/scribble
if [ ! -f "$SDIR/iter_60000.pth" ] && [ "$(left)" -gt 2400 ]; then
  run_watch model/r5_s2l.log $(( $(left) - 900 )) 1200 \
    python scripts/train_s2l.py --fold fold1 --steps_per_call 20 \
      --ckpt_every 3000 --resume
fi
if [ -f "$SDIR/iter_60000.pth" ] \
    && ! grep -qs '\[0' model/r5_s2l_test.log 2>/dev/null \
    && [ "$(left)" -gt 700 ]; then
  run_watch model/r5_s2l_test.log 1500 900 python \
    scripts/test_2D_fully.py --exp ACDC/pCE_scribble2label --fold fold1 \
    --no_save
fi

# ---- 4. matrix cells, fold-major so a cut leaves balanced coverage ----
for fold in fold1 fold2 fold3 fold4 fold5; do
  for m in pce dmpls; do
    if [ "$(left)" -gt 1800 ]; then
      run_watch "model/r5_matrix_${m}_${fold}.log" 1700 900 \
        python scripts/launch_experiments.py --methods "$m" --folds "$fold" \
          --extra "--max_iterations 15000 --steps_per_call 20 --resume --val_every 500 --snapshot_root model/r5_matrix"
    fi
  done
done

# ---- 5. fresh trace at HEAD defaults ----------------------------------
if [ "$(left)" -gt 700 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r5tail \
    run_watch model/r5_trace_tail.log 1100 900 python scripts/capture_trace.py
fi

echo CHAIN_R5E_DONE
