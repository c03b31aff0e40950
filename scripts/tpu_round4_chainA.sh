#!/bin/bash
# Round-4 TPU chain A — the high-certainty quality gates first:
#   1. DMPLS fold1 60k with HEAD defaults (VERDICT r3 item 4: re-earn the
#      north star on today's code — Pallas conv, rbg PRNG, device aug,
#      matmul tconv, fused BN)
#   2. fold1 offline test (reference protocol, test_2D_fully_sps)
#   3. conv-ceiling rerun with the self-validating fence
#      (VERDICT r3 item 7)
# Chain B (ScribbleVC 200ep + held-out test) launches separately after A
# so an interactive perf window fits in between.
#
# v2: run_watch replaces run_retry — the first launch hung 17 min into
# the run (device call blocked, zero socket traffic on the relay, the
# round-3 outage failure class). The watchdog kills a stage whose log
# goes stale and retries it with --resume so at most ckpt_every
# iterations are lost. Per-attempt logs and rc-guarded dependent stages
# (ADVICE r3) kept.
set -x
cd /root/repo
mkdir -p model

# run_watch <logfile> <timeout_s> <stale_s> <resume_flag|-> <cmd...>
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

run_watch model/r4_dmpls_fold1.log 6600 420 --resume python \
  scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
  --fold fold1 --steps_per_call 10 --ckpt_every 1000
dmpls_rc=$?

if [ -f model/ACDC_pCE_SPS_fold1/scribble/iter_60000.pth ]; then
  run_watch model/r4_dmpls_test_fold1.log 2100 600 - python \
    scripts/test_2D_fully_sps.py --fold fold1 --no_save
else
  echo "SKIP test: no iter_60000.pth (train rc=$dmpls_rc)" \
    > model/r4_dmpls_test_fold1.log
fi

run_watch model/r4_bench_conv.json 2400 600 - python scripts/bench_conv.py

echo CHAIN_R4A_DONE
