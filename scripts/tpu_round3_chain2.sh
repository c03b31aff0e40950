#!/bin/bash
# Round-3 chain v2 — after the first chain was cut short by the
# scribblevc remote-compile SIGSEGV (see RESULTS round 3). Order:
#   1. fully_supervised bench + trace on the fused-maxpool step (the
#      round's headline number)
#   2. DMPLS fold1+fold2 60k runs + offline tests (quality-unchanged
#      evidence for the Pallas-conv/maxpool step, VERDICT r2 item 1)
#   3. conv ceiling table rerun with the fixed fence
#   4. dmpls/pce re-bench on the fused-maxpool step
set -x
cd /root/repo

BENCH_METHOD=fully_supervised timeout 2400 python bench.py \
  > model/r3_bench_fullsup_pool.json 2> model/r3_bench_fullsup_pool.err

TRACE_METHOD=fully_supervised TRACE_DIR=/tmp/trace_r3c \
  timeout 1200 python scripts/capture_trace.py \
  > model/r3_trace_pool.log 2>&1

for FOLD in fold1 fold2; do
  timeout 7200 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/r3_dmpls_$FOLD.log 2>&1
  timeout 1800 python scripts/test_2D_fully_sps.py --fold $FOLD --no_save \
    > model/r3_dmpls_test_$FOLD.log 2>&1
done

timeout 3600 python scripts/bench_conv.py \
  > model/r3_bench_conv2.json 2> model/r3_bench_conv2.err

for M in dmpls pce; do
  BENCH_METHOD=$M timeout 2400 python bench.py \
    > model/r3_bench_${M}_pool.json 2> model/r3_bench_${M}_pool.err
done

echo CHAIN_R3V2_DONE
