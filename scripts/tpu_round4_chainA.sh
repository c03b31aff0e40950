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
# ADVICE r3 fixes: per-attempt logs (no truncation across retries) and
# dependent stages guarded on the training stage's exit code.
set -x
cd /root/repo
mkdir -p model

run_retry() {  # run_retry <logfile> <timeout_s> <cmd...>
  local log=$1 tmo=$2; shift 2
  local rc=1
  for attempt in 1 2 3; do
    timeout "$tmo" "$@" > "$log.$attempt" 2> "$log.$attempt.err"
    rc=$?
    cat "$log.$attempt" >> "$log"; cat "$log.$attempt.err" >> "$log.err"
    if ! grep -q "Unable to initialize backend" "$log.$attempt" "$log.$attempt.err"; then
      return $rc
    fi
    echo "init-race on attempt $attempt, cooling down" >> "$log.err"
    sleep 180
  done
  return $rc
}

run_retry model/r4_dmpls_fold1.log 6000 python \
  scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
  --fold fold1 --steps_per_call 10
dmpls_rc=$?

if [ -f model/ACDC_pCE_SPS_fold1/scribble/iter_60000.pth ]; then
  run_retry model/r4_dmpls_test_fold1.log 2100 python \
    scripts/test_2D_fully_sps.py --fold fold1 --no_save
else
  echo "SKIP test: no iter_60000.pth (train rc=$dmpls_rc)" \
    > model/r4_dmpls_test_fold1.log
fi

run_retry model/r4_bench_conv.json 2400 python scripts/bench_conv.py

echo CHAIN_R4A_DONE
