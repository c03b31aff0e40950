#!/bin/bash
# Round-5 chain F — endgame reallocation. The morning's host-arm
# restarts + compile-cache invalidation left ~90 min of TPU for what
# chainD had sized at 60k schedules; rather than one truncated 60k run,
# S2L and USTM get the DOCUMENTED REDUCED 15k schedule (the same
# protocol the matrix cells use; RESULTS.md records the deviation) so
# both VERDICT-item-9 methods land complete, tested rows. The fs24
# bench between them re-seeds the XLA compile cache for the driver's
# end-of-round BENCH run. Launched manually after chainD's pce60k test;
# assumes chainD/E are dead.
set -x
cd /root/repo
mkdir -p model
START=$(date +%s)
DEADLINE=${CHAIN_DEADLINE:-$((START + 5100))}
left() { echo $(( DEADLINE - $(date +%s) )); }

run_watch() {  # <logfile> <timeout_s> <stale_s> <cmd...>
  local log=$1 tmo=$2 stale=$3; shift 3
  local lft; lft=$(left)
  if [ "$lft" -lt 240 ]; then return 1; fi
  if [ "$tmo" -gt "$lft" ]; then tmo=$lft; fi
  timeout "$tmo" "$@" > "$log.f" 2> "$log.f.err" &
  local tpid=$!
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 60
    local now m
    now=$(date +%s)
    m=$(stat -c %Y "$log.f" 2>/dev/null || echo "$now")
    if [ $((now - m)) -gt "$stale" ]; then
      echo "stale ${stale}s, killing" >> "$log.f.err"
      pkill -P "$tpid"
      sleep 5
      kill "$tpid" 2>/dev/null
      break
    fi
  done
  wait "$tpid"
  cat "$log.f" >> "$log" 2>/dev/null
  cat "$log.f.err" >> "$log.err" 2>/dev/null
}

latest_ckpt() {  # <dir> -> newest periodic iter_*.pth basename
  ls -t "$1"/iter_*.pth 2>/dev/null | grep -v dice | head -1 | xargs -r basename
}

# ---- 1. S2L fold1, 15k reduced schedule + offline test ---------------
SDIR=model/ACDC/pCE_scribble2label_fold1/scribble
if [ "$(left)" -gt 1200 ]; then
  run_watch model/r5_s2l.log 3000 1200 \
    python scripts/train_s2l.py --fold fold1 --steps_per_call 20 \
      --max_iterations 15000 --ckpt_every 3000 --resume
fi
SCP=$(latest_ckpt "$SDIR")
if [ -n "$SCP" ] && [ "$(left)" -gt 600 ]; then
  run_watch model/r5_s2l_test.log 1100 900 python \
    scripts/test_2D_fully.py --exp ACDC/pCE_scribble2label --fold fold1 \
    --checkpoint "$SCP" --no_save
fi

# ---- 2. fs24 bench at HEAD defaults (compile-cache seed + headline) ---
if [ "$(left)" -gt 900 ]; then
  BENCH_METHOD=fully_supervised \
    run_watch model/r5_bench_fs24_default.json 1400 1100 python bench.py
fi

# ---- 3. USTM fold1, 15k reduced schedule + offline test ---------------
UDIR=model/ACDC/pCE_Seg_USTM_fold1/scribble
if [ "$(left)" -gt 1200 ]; then
  run_watch model/r5_ustm.log 3300 1200 \
    python scripts/train_weakly_supervised_ustm_2D.py --fold fold1 \
      --steps_per_call 20 --max_iterations 15000 --ckpt_every 3000 --resume
fi
UCP=$(latest_ckpt "$UDIR")
if [ -n "$UCP" ] && [ "$(left)" -gt 500 ]; then
  run_watch model/r5_ustm_test.log 1100 900 python \
    scripts/test_2D_fully.py --exp ACDC/pCE_Seg_USTM --fold fold1 \
    --checkpoint "$UCP" --no_save
fi

# ---- 4. fresh trace at HEAD defaults ----------------------------------
if [ "$(left)" -gt 700 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r5tail \
    run_watch model/r5_trace_tail.log 1100 900 python scripts/capture_trace.py
fi

echo CHAIN_R5F_DONE
