#!/bin/bash
# Round-3 TPU chain v4 — follow-ups after chain3:
#   * DMPLS fold1 60k + test (chain3's attempt died at backend init: the
#     previous stage was timeout-killed and the TPU lease lingered, so
#     every stage here retries init failures after a cool-down)
#   * ScribbleVC infer bench retry with the compile-lean knobs
# Usage: bash scripts/tpu_round3_chain4.sh
set -x
cd /root/repo

run_retry() {  # run_retry <logfile> <timeout_s> <cmd...>
  # stdout -> log (clean JSON for benches), stderr -> log.err
  local log=$1 tmo=$2; shift 2
  for attempt in 1 2 3; do
    timeout "$tmo" "$@" > "$log" 2> "$log.err"
    local rc=$?
    if ! grep -q "Unable to initialize backend" "$log" "$log.err"; then
      return $rc
    fi
    echo "init-race on attempt $attempt, cooling down" >> "$log.err"
    sleep 180
  done
  return 1
}

run_retry model/r3_dmpls_fold1.log 5400 python \
  scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
  --fold fold1 --steps_per_call 10
run_retry model/r3_dmpls_test_fold1.log 1800 python \
  scripts/test_2D_fully_sps.py --fold fold1 --no_save

BENCH_MODEL=scribblevc BENCH_BUCKET=16 BENCH_VOLS=12 run_retry \
  model/r3c4_infer_scribblevc.json 3000 python scripts/bench_infer.py

echo CHAIN_R3V4_DONE
