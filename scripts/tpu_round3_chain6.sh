#!/bin/bash
# Round-3 TPU chain v6 — relaunch after the VM reset that followed the
# tunnel outage (chain5 and its watcher died with the VM; model/ was
# untracked and is gone). Same deliverables as chain5, reordered so the
# quality gates land first:
#   1. ScribbleVC ACDC 200 epochs, test-rule selection, held-out test
#      (VERDICT r2 item 3 — the quality gate)
#   2. DMPLS fold1 + fold2 60k + offline tests (quality-unchanged
#      evidence for the 2x-faster conv path, VERDICT r2 item 1)
#   3. Layout-attribution bench matrix (which custom-call pins cause
#      the ~12 ms formatting row)
#   4. 10k-iter aug-parity A/B (VERDICT r2 item 7)
#   5. conv ceiling rerun (fixed fence), scribblevc infer bench, trace
# Every stage retries backend-init races after a cool-down.
set -x
cd /root/repo
mkdir -p model

run_retry() {  # run_retry <logfile> <timeout_s> <cmd...>
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

run_retry model/r3_scribblevc_run.log 14400 python \
  scripts/train_ACDC_scribblevc.py --steps_per_call 5
run_retry model/r3_scribblevc_test.log 3600 python \
  scripts/test_ACDC_scribblevc.py

for FOLD in fold1 fold2; do
  run_retry model/r3_dmpls_$FOLD.log 5400 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10
  run_retry model/r3_dmpls_test_$FOLD.log 3000 python \
    scripts/test_2D_fully_sps.py --fold $FOLD --no_save
done

# Layout-attribution matrix: fully_supervised bench across
# augment/conv implementation pairs.
for AUG in pallas xla; do
  for CONV in pallas direct; do
    WSL4MIS_AUG_IMPL=$AUG WSL4MIS_CONV_IMPL=$CONV run_retry \
      model/r3_mx_${AUG}_${CONV}.json 2400 python bench.py
  done
done

run_retry model/r3_ab_device.log 3600 python \
  scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10kdev --aug_mode device \
  --steps_per_call 10
run_retry model/r3_ab_host.log 10800 python \
  scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10khost --aug_mode host \
  --device_data 0

run_retry model/r3_bench_conv2.json 3600 python scripts/bench_conv.py

BENCH_MODEL=scribblevc BENCH_BUCKET=16 BENCH_VOLS=12 run_retry \
  model/r3c4_infer_scribblevc.json 3000 python scripts/bench_infer.py

TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r3c run_retry \
  model/r3_trace_pool.log 1800 python scripts/capture_trace.py

echo CHAIN_R3V6_DONE
