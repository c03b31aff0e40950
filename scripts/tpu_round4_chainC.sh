#!/bin/bash
# Round-4 TPU chain C — the two remaining VERDICT quality items, launched
# after the Pallas-pool A/B (scripts/bench_multi.py) decides the pool
# default:
#   1. Decision-grade 10k aug-parity A/B (VERDICT r4 item 5): pce fold1,
#      identical seed/schedule, aug_mode=device (production) vs host
#      (reference-exact scipy). Host pays ~0.3-0.8 s/it on this 1-core VM,
#      so it gets the big timeout and runs second.
#   2. 5-fold matrix (VERDICT r4 item 6): pce, dmpls, pce_gatedcrf over
#      folds 1-5 via scripts/launch_experiments.py at a documented
#      reduced schedule (15k iters vs the reference 60k), isolated under
#      model/r4_matrix.
#   3. Deadline-gated tail: fresh bench-zoo rows + step trace at HEAD
#      defaults for BENCH_r04/RESULTS.
set -x
cd /root/repo
mkdir -p model

DEADLINE=${CHAINC_DEADLINE:-1787168400}   # ~19:40 UTC; driver bench after
ONE_CORE_NOTE="serialize: this VM has one CPU core"

# run_watch <logfile> <timeout_s> <stale_s> <resume_flag|-> <cmd...>
# per-attempt logs are appended (ADVICE r3: never truncate history);
# resume_flag is appended bare on retries (argparse store_true flags).
run_watch() {
  local log=$1 tmo=$2 stale=$3 resume=$4; shift 4
  local rc=1
  for attempt in 1 2 3 4; do
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
    if [ "$rc" -eq 0 ]; then
      return 0
    fi
    sleep 60
  done
  return "$rc"
}

left() { echo $((DEADLINE - $(date +%s))); }

# ---- 1. aug-parity A/B (pce fold1, 10k iters, same seed) -------------
if [ "$(left)" -gt 14000 ]; then
  run_watch model/r4_augab_device.log 5400 600 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --steps_per_call 10 --aug_mode device \
      --snapshot_root model/r4_augab_device
fi
if [ "$(left)" -gt 12000 ]; then
  H_TMO=$(( $(left) - 10000 )); [ "$H_TMO" -gt 10800 ] && H_TMO=10800
  run_watch model/r4_augab_host.log "$H_TMO" 1200 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --aug_mode host \
      --snapshot_root model/r4_augab_host
fi

# ---- 2. 5-fold matrix at reduced schedule ----------------------------
# one launch_experiments invocation per method so each is separately
# deadline-gated and stale-watched; --resume makes retries pick up
# mid-fold. 15k iters is the documented reduced schedule.
for m in dmpls pce pce_gatedcrf; do
  if [ "$(left)" -gt 5000 ]; then
    run_watch "model/r4_matrix_$m.log" $(( $(left) - 3000 )) 900 - \
      python scripts/launch_experiments.py --methods "$m" --folds all \
        --extra "--max_iterations 15000 --steps_per_call 10 --resume \
          --snapshot_root model/r4_matrix"
  fi
done

# ---- 3. tail: fresh bench zoo + trace at HEAD defaults ---------------
if [ "$(left)" -gt 2400 ]; then
  BENCH_MULTI_ONLY=fs24_head_default,dmpls6_pool_pallas,pce24_pool_pallas \
    BENCH_MULTI_OUT=model/r4_bench_tail.json \
    run_watch model/r4_bench_tail.log 2000 600 - python scripts/bench_multi.py
fi
if [ "$(left)" -gt 1500 ]; then
  TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r4c \
    run_watch model/r4_trace_tail.log 1400 600 - python scripts/capture_trace.py
fi

echo CHAIN_R4C_DONE
