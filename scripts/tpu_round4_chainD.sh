#!/bin/bash
# Round-4 TPU chain D — the remaining VERDICT quality items, restructured
# from chain C (never launched before the previous session ended) with a
# YIELD gate so interactive perf measurements can borrow the chip between
# jobs:
#   * `touch /tmp/tpu_yield` pauses the chain before its next job starts
#     (the in-flight job finishes first); `rm /tmp/tpu_yield` resumes.
#   1. Decision-grade 10k aug-parity A/B device half (VERDICT r4 item 5).
#   2. 5-fold matrix (VERDICT r4 item 6): dmpls, pce, pce_gatedcrf over
#      folds 1-5 via scripts/launch_experiments.py, one (method,fold) job
#      per invocation so every job is yield-/deadline-gated, at the
#      documented reduced schedule (15k iters vs the reference 60k),
#      isolated under model/r4_matrix.
#   3. aug-parity host half LAST: it pins this VM's single CPU core for
#      1-2 h (scipy rotate per sample), so it runs when interactive work
#      is done; --resume makes a deadline cut resumable.
set -x
cd /root/repo
mkdir -p model

DEADLINE=${CHAIND_DEADLINE:-1787179000}

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
wait_yield() { while [ -f /tmp/tpu_yield ]; do sleep 20; done; }

# ---- 1. aug-parity A/B, device half (pce fold1, 10k iters) -----------
wait_yield
if [ "$(left)" -gt 20000 ] && [ ! -f model/r4_augab_device/DONE ]; then
  run_watch model/r4_augab_device.log 5400 600 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --steps_per_call 10 --aug_mode device \
      --snapshot_root model/r4_augab_device \
    && touch model/r4_augab_device/DONE
fi

# ---- 2. 5-fold matrix at reduced schedule (15k iters, documented) ----
for m in dmpls pce pce_gatedcrf; do
  for f in fold1 fold2 fold3 fold4 fold5; do
    wait_yield
    if [ "$(left)" -gt 7200 ] && [ ! -f "model/r4_matrix/DONE_${m}_${f}" ]; then
      run_watch "model/r4_matrix_${m}_${f}.log" 3600 900 - \
        python scripts/launch_experiments.py --methods "$m" --folds "$f" \
          --extra "--max_iterations 15000 --steps_per_call 10 --resume \
            --snapshot_root model/r4_matrix" \
        && touch "model/r4_matrix/DONE_${m}_${f}"
    fi
  done
done

# ---- 3. aug-parity A/B, host half (single-core hog: runs last) -------
wait_yield
if [ "$(left)" -gt 1800 ] && [ ! -f model/r4_augab_host/DONE ]; then
  H_TMO=$(left); [ "$H_TMO" -gt 10800 ] && H_TMO=10800
  run_watch model/r4_augab_host.log "$H_TMO" 1800 --resume \
    python scripts/train_weakly_supervised_pCE_2D.py --fold fold1 \
      --max_iterations 10000 --aug_mode host \
      --snapshot_root model/r4_augab_host \
    && touch model/r4_augab_host/DONE
fi

echo CHAIN_R4D_DONE
