#!/bin/bash
# Round-2 TPU chain, part 2 (after benches + aug A/B):
#   0. perf_probe decompositions (aug/fwd/step, matmul calibration,
#      fused-vs-flax BN, K-scan amortization)
#   1. ScribbleVC ACDC MAAGfold 200 epochs + held-out 15-patient test
#   2. DMPLS fold1/fold2 (60k iters) + per-fold offline test
set -x
cd /root/repo

BENCH_METHOD=fully_supervised timeout 1800 python scripts/perf_probe.py \
  > model/probe_fullsup.json 2> model/probe_fullsup.err
BENCH_METHOD=fully_supervised WSL4MIS_BN_IMPL=flax BENCH_CALIBRATE=0 \
  timeout 1800 python scripts/perf_probe.py \
  > model/probe_fullsup_flaxbn.json 2> model/probe_fullsup_flaxbn.err
BENCH_METHOD=fully_supervised BENCH_SCAN_K=50 BENCH_CALIBRATE=0 \
  timeout 1800 python scripts/perf_probe.py \
  > model/probe_fullsup_k50.json 2> model/probe_fullsup_k50.err
BENCH_METHOD=dmpls BENCH_CALIBRATE=0 timeout 1800 python \
  scripts/perf_probe.py \
  > model/probe_dmpls.json 2> model/probe_dmpls.err

timeout 12600 python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/scribblevc_run.log 2>&1
timeout 2400 python scripts/test_ACDC_scribblevc.py \
  > model/scribblevc_test.log 2>&1

for FOLD in fold1 fold2; do
  timeout 5400 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/dmpls_$FOLD.log 2>&1
  timeout 1800 python scripts/test_2D_fully_sps.py --fold $FOLD --no_save \
    > model/dmpls_test_$FOLD.log 2>&1
done
echo CHAIN4_DONE
