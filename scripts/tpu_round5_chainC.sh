#!/bin/bash
# Round-5 chain C: finish the ScribbleVC run (resume from latest_full;
# chainA's attempt hung on a dead tunnel call at iter 12900), test it,
# fire the kernel-A/B hook, then exec chainB for the remaining stages.
set -x
cd /root/repo
START=$(date +%s)
DEADLINE=${CHAIN_DEADLINE:-$((START + 16200))}
left() { echo $(( DEADLINE - $(date +%s) )); }

run_watch() {
  local log=$1 tmo=$2 stale=$3 resume=$4; shift 4
  local rc=1
  for attempt in 1 2 3; do
    local lft; lft=$(left)
    if [ "$lft" -lt 300 ]; then return 1; fi
    if [ "$tmo" -gt "$lft" ]; then tmo=$lft; fi
    local extra=()
    if [ "$resume" != "-" ] && [ "$attempt" -gt 1 ]; then
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
        pkill -P "$tpid"
        sleep 5
        kill "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid"; rc=$?
    cat "$log.$attempt" >> "$log" 2>/dev/null
    cat "$log.$attempt.err" >> "$log.err" 2>/dev/null
    if [ "$rc" -eq 0 ]; then return 0; fi
    sleep 60
  done
  return "$rc"
}

# svc: ~9k iters left at ~0.13 s + vals; resume-capable, 4 attempts' worth
if [ "$(left)" -gt 3600 ]; then
  run_watch model/r5_scribblevc_resume.log 4200 900 - python \
    scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
    --val_every_epoches 2 --light_val 1 --ckpt_epoches 25 --resume=1
fi
if [ -f model/ACDC_ScribbleVC_MAAGfold/scribble/scribblevc_best_model.pth ]; then
  run_watch model/r5_scribblevc_test.log 1800 900 - python \
    scripts/test_ACDC_scribblevc.py
fi

# hook 1 (kernel A/B) before handing off
if [ -x model/r5_hook.sh ] && [ "$(left)" -gt 3000 ]; then
  timeout 2700 bash model/r5_hook.sh > model/r5_hook.log 2>&1
  mv model/r5_hook.sh "model/r5_hook.done.$(date +%s)"
fi

CHAIN_DEADLINE=$DEADLINE exec bash scripts/tpu_round5_chainB.sh
