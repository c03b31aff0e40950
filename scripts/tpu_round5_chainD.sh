#!/bin/bash
# Round-5 chain D — continuation of chainB with the REAL session budget.
# chainB inherited chainC's deadline (11:16 UTC) sized for a 4.5 h
# window, but the session runs until ~17:00; without this chain the
# s2l/ustm/matrix stages (VERDICT items 5 and 9) would be skipped for
# schedule, not for cause. Waits for chainB to exit, then runs every
# remaining stage artifact-gated (whatever B finished is skipped, every
# training stage resumes from latest_full.ckpt).
set -x
cd /root/repo
mkdir -p model
START=$(date +%s)
DEADLINE=${CHAIN_DEADLINE:-$((START + 23400))}
B_PID=${CHAIN_B_PID:-14799}
left() { echo $(( DEADLINE - $(date +%s) )); }

# ---- 0. wait for chainB (it owns the TPU until it exits) --------------
while kill -0 "$B_PID" 2>/dev/null; do
  if [ "$(left)" -lt 600 ]; then echo "deadline while waiting for B"; exit 1; fi
  sleep 60
done

hook() {
  if [ -x model/r5_hook.sh ] && [ "$(left)" -gt 2400 ]; then
    timeout 2100 bash model/r5_hook.sh > model/r5_hook.log 2>&1
    mv model/r5_hook.sh "model/r5_hook.done.$(date +%s)"
  fi
}

# run_watch <logfile> <timeout_s> <stale_s> <resume_flag|-> <cmd...>
# resume flag (when not "-") is passed on EVERY attempt: the trainer
# ignores it when no latest_full.ckpt exists yet.
run_watch() {
  local log=$1 tmo=$2 stale=$3 resume=$4; shift 4
  local rc=1
  for attempt in 4 5 6; do
    local lft; lft=$(left)
    if [ "$lft" -lt 300 ]; then return 1; fi
    if [ "$tmo" -gt "$lft" ]; then tmo=$lft; fi
    local extra=()
    if [ "$resume" != "-" ]; then
      extra=("$resume")
    fi
    timeout "$tmo" "$@" "${extra[@]}" > "$log.$attempt" 2> "$log.$attempt.err" &
    local tpid=$!
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      local now m
      now=$(date +%s)
      m=$(stat -c %Y "$log.$attempt" 2>/dev/null || echo "$now")
      if [ $((now - m)) -gt "$stale" ]; then
        echo "stale ${stale}s on attempt $attempt, killing" >> "$log.err"
        pkill -P "$tpid"   # timeout's direct child (the python) by PPID
        sleep 5
        kill "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid"; rc=$?
    cat "$log.$attempt" >> "$log" 2>/dev/null
    cat "$log.$attempt.err" >> "$log.err" 2>/dev/null
    if [ "$rc" -eq 0 ]; then
      return 0
    fi
    sleep 30
  done
  return "$rc"
}

done_iter() {  # done_iter <logglob-base> <iter>
  grep -qs "iteration $2 :" "$1" "$1".[0-9] 2>/dev/null
}

hook

# ---- 2. aug A/B host arm (mandate 2, first half) ----------------------
if ! done_iter model/r5_augab_host.log 10000 && [ "$(left)" -gt 1800 ]; then
  run_watch model/r5_augab_host.log 7200 1800 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --aug_mode host \
      --snapshot_root model/r5_augab_host
fi

# ---- 3. pCE fold1 full 60k + offline test (mandate 2, second half) ----
if [ ! -f model/ACDC_pCE_fold1/scribble/iter_60000.pth ] \
    && [ "$(left)" -gt 1800 ]; then
  run_watch model/r5_pce60k.log 4500 900 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 60000 --steps_per_call 20 --ckpt_every 3000
fi
if [ -f model/ACDC_pCE_fold1/scribble/iter_60000.pth ] \
    && ! grep -qs 'mean' model/r5_pce60k_test.log 2>/dev/null \
    && [ "$(left)" -gt 900 ]; then
  run_watch model/r5_pce60k_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC_pCE --fold fold1 --no_save
fi

hook

# ---- 4. S2L + USTM fold1, documented schedules + offline tests --------
if [ ! -f "model/ACDC/pCE_scribble2label_fold1/scribble/iter_60000.pth" ] \
    && [ "$(left)" -gt 2400 ]; then
  run_watch model/r5_s2l.log 5400 900 --resume \
    python scripts/train_s2l.py --fold fold1 --steps_per_call 20 \
      --ckpt_every 3000
fi
if [ -f "model/ACDC/pCE_scribble2label_fold1/scribble/iter_60000.pth" ] \
    && [ "$(left)" -gt 900 ]; then
  run_watch model/r5_s2l_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC/pCE_scribble2label --fold fold1 \
    --no_save
fi
if [ ! -f "model/ACDC/pCE_Seg_USTM_fold1/scribble/iter_60000.pth" ] \
    && [ "$(left)" -gt 2400 ]; then
  run_watch model/r5_ustm.log 7200 900 --resume \
    python scripts/train_weakly_supervised_ustm_2D.py --fold fold1 \
      --steps_per_call 20 --ckpt_every 3000
fi
if [ -f "model/ACDC/pCE_Seg_USTM_fold1/scribble/iter_60000.pth" ] \
    && [ "$(left)" -gt 900 ]; then
  run_watch model/r5_ustm_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC/pCE_Seg_USTM --fold fold1 --no_save
fi

hook

# ---- 5. matrix cells at the documented reduced 15k schedule -----------
# launch_experiments skips cells whose final checkpoint already exists
# when --resume is in the extra flags (each cell resumes/refreshes).
for m in pce dmpls pce_gatedcrf; do
  if [ "$(left)" -gt 2700 ]; then
    run_watch "model/r5_matrix_$m.log" $(( $(left) - 2100 )) 1200 - \
      python scripts/launch_experiments.py --methods "$m" --folds all \
        --extra "--max_iterations 15000 --steps_per_call 20 --resume --val_every 500 --snapshot_root model/r5_matrix"
  fi
done

hook

# ---- 6. tail: bench zoo with variance bars + fresh trace --------------
if [ "$(left)" -gt 1500 ]; then
  BENCH_MULTI_OUT=model/r5_bench_multi.json \
    run_watch model/r5_bench_tail.log 2200 900 - python scripts/bench_multi.py
fi
if [ "$(left)" -gt 700 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r5tail \
    run_watch model/r5_trace_tail.log 1100 900 - python scripts/capture_trace.py
fi

echo CHAIN_R5D_DONE
