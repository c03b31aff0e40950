#!/bin/bash
# Round-5 chain B — stages 2-6 of chainA with gates sized to the actual
# remaining budget (chainA's gates assumed an 8.5 h deadline and would
# have dropped the pCE 60k run — mandate 2's second half — while still
# running the lower-priority matrix). Launched at the hook-1 boundary
# after chainA's ScribbleVC stage; chainA is stopped cleanly there.
set -x
cd /root/repo
mkdir -p model
START=$(date +%s)
DEADLINE=${CHAIN_DEADLINE:-$((START + 17000))}
left() { echo $(( DEADLINE - $(date +%s) )); }

hook() {
  if [ -x model/r5_hook.sh ] && [ "$(left)" -gt 3000 ]; then
    timeout 2700 bash model/r5_hook.sh > model/r5_hook.log 2>&1
    mv model/r5_hook.sh "model/r5_hook.done.$(date +%s)"
  fi
}

# run_watch <logfile> <timeout_s> <stale_s> <resume_flag|-> <cmd...>
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
    sleep 60
  done
  return "$rc"
}

# ---- 2. aug-parity A/B (pce fold1, 10k iters, same seed, both arms) ---
# device arm ~12 min; first-compile silence is covered by the watchdog
if [ "$(left)" -gt 2400 ]; then
  run_watch model/r5_augab_device.log 2400 900 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --steps_per_call 10 --aug_mode device \
      --snapshot_root model/r5_augab_device
fi
# host arm: reserve pce60k (~3300s) + its test + bench tail behind it
if [ "$(left)" -gt 6000 ]; then
  H_TMO=$(( $(left) - 4800 )); [ "$H_TMO" -gt 10800 ] && H_TMO=10800
  run_watch model/r5_augab_host.log "$H_TMO" 1800 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --aug_mode host \
      --snapshot_root model/r5_augab_host
fi

hook

# ---- 3. pCE fold1 at the FULL 60k reference schedule + offline test ---
if [ "$(left)" -gt 3300 ]; then
  run_watch model/r5_pce60k.log 4500 900 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 60000 --steps_per_call 10 --ckpt_every 3000
fi
if [ -f model/ACDC_pCE_fold1/scribble/iter_60000.pth ]; then
  run_watch model/r5_pce60k_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC_pCE --fold fold1 --no_save
fi

hook

# ---- 4. S2L + USTM fold1, documented schedules + offline tests --------
if [ "$(left)" -gt 4200 ]; then
  run_watch model/r5_s2l.log 5400 900 --resume \
    python scripts/train_s2l.py --fold fold1 --steps_per_call 10 \
      --ckpt_every 3000
fi
if [ -f "model/ACDC/pCE_scribble2label_fold1/scribble/iter_60000.pth" ]; then
  run_watch model/r5_s2l_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC/pCE_scribble2label --fold fold1 \
    --no_save
fi
if [ "$(left)" -gt 4200 ]; then
  run_watch model/r5_ustm.log 5400 900 --resume \
    python scripts/train_weakly_supervised_ustm_2D.py --fold fold1 \
      --steps_per_call 10 --ckpt_every 3000
fi
if [ -f "model/ACDC/pCE_Seg_USTM_fold1/scribble/iter_60000.pth" ]; then
  run_watch model/r5_ustm_test.log 1500 900 - python \
    scripts/test_2D_fully.py --exp ACDC/pCE_Seg_USTM --fold fold1 --no_save
fi

hook

# ---- 5. matrix cells at the documented reduced 15k schedule -----------
for m in pce dmpls pce_gatedcrf; do
  if [ "$(left)" -gt 3000 ]; then
    run_watch "model/r5_matrix_$m.log" $(( $(left) - 2400 )) 1200 - \
      python scripts/launch_experiments.py --methods "$m" --folds all \
        --extra "--max_iterations 15000 --steps_per_call 10 --resume --val_every 500 --snapshot_root model/r5_matrix"
  fi
done

hook

# ---- 6. tail: bench zoo with variance bars + fresh trace --------------
if [ "$(left)" -gt 2400 ]; then
  BENCH_MULTI_OUT=model/r5_bench_multi.json \
    run_watch model/r5_bench_tail.log 2200 900 - python scripts/bench_multi.py
fi
if [ "$(left)" -gt 1200 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r5tail \
    run_watch model/r5_trace_tail.log 1100 900 - python scripts/capture_trace.py
fi

echo CHAIN_R5B_DONE
