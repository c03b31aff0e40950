#!/bin/bash
# Round-3 TPU chain v3 — the first chain died on the scribblevc
# remote-compile SIGSEGV and v2 never launched (session cut). Ordered so
# guaranteed driver-visible deliverables land first:
#   1. bench.py zoo re-run on the fused-maxpool step (headline number)
#   2. scribblevc bench + infer bench (needs the compile fix)
#   3. DMPLS fold1+fold2 60k + offline tests (quality-unchanged evidence
#      for the Pallas-conv/maxpool step, VERDICT r2 item 1)
#   4. ScribbleVC ACDC 200 epochs with test-rule selection, then the
#      held-out test table (VERDICT r2 item 3)
#   5. 10k-iter aug-parity A/B (VERDICT r2 item 7)
#   6. conv ceiling rerun with the fixed fence + a post-maxpool trace
set -x
cd /root/repo

for M in fully_supervised dmpls pce pce_gatedcrf; do
  BENCH_METHOD=$M timeout 2400 python bench.py \
    > model/r3c3_bench_$M.json 2> model/r3c3_bench_$M.err
done

BENCH_METHOD=scribblevc timeout 3600 python bench.py \
  > model/r3c3_bench_scribblevc.json 2> model/r3c3_bench_scribblevc.err
BENCH_MODEL=scribblevc timeout 2400 python scripts/bench_infer.py \
  > model/r3c3_infer_scribblevc.json 2> model/r3c3_infer_scribblevc.err

for FOLD in fold1 fold2; do
  timeout 5400 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/r3_dmpls_$FOLD.log 2>&1
  timeout 1800 python scripts/test_2D_fully_sps.py --fold $FOLD --no_save \
    > model/r3_dmpls_test_$FOLD.log 2>&1
done

timeout 14400 python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/r3_scribblevc_run.log 2>&1
timeout 2400 python scripts/test_ACDC_scribblevc.py \
  > model/r3_scribblevc_test.log 2>&1

timeout 3600 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10kdev --aug_mode device \
  --steps_per_call 10 > model/r3_ab_device.log 2>&1
timeout 10800 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10khost --aug_mode host \
  --device_data 0 > model/r3_ab_host.log 2>&1

timeout 3600 python scripts/bench_conv.py \
  > model/r3_bench_conv2.json 2> model/r3_bench_conv2.err

TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r3c \
  timeout 1200 python scripts/capture_trace.py \
  > model/r3_trace_pool.log 2>&1

echo CHAIN_R3V3_DONE
