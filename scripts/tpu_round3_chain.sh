#!/bin/bash
# Round-3 TPU job chain (one TPU process at a time), ordered so the
# guaranteed deliverables land first:
#   1. bench.py zoo on the Pallas-conv default path (VERDICT r2 item 6)
#   2. conv-shaped ceiling table (VERDICT r2 item 4)
#   3. fused device-side serving bench (VERDICT r2 item 8)
#   4. ScribbleVC ACDC 200 epochs with test-rule selection + gradient-flow
#      fix, then the held-out test table (VERDICT r2 item 3)
#   5. DMPLS fold1/fold2 60k on the new conv path + offline test
#      (quality-unchanged evidence for VERDICT r2 item 1)
#   6. best-effort: 10k-iter aug-parity A/B (VERDICT r2 item 7)
set -x
cd /root/repo

for M in fully_supervised dmpls pce pce_gatedcrf scribblevc; do
  BENCH_METHOD=$M timeout 2400 python bench.py \
    > model/r3_bench_$M.json 2> model/r3_bench_$M.err
done

timeout 2400 python scripts/bench_conv.py \
  > model/r3_bench_conv.json 2> model/r3_bench_conv.err

for MODEL in unet unet_cct scribblevc; do
  BENCH_MODEL=$MODEL timeout 1500 python scripts/bench_infer.py \
    > model/r3_infer_$MODEL.json 2> model/r3_infer_$MODEL.err
done

timeout 14400 python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/r3_scribblevc_run.log 2>&1
timeout 2400 python scripts/test_ACDC_scribblevc.py \
  > model/r3_scribblevc_test.log 2>&1

for FOLD in fold1 fold2; do
  timeout 5400 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/r3_dmpls_$FOLD.log 2>&1
  timeout 1800 python scripts/test_2D_fully_sps.py --fold $FOLD --no_save \
    > model/r3_dmpls_test_$FOLD.log 2>&1
done

# Best-effort: decision-grade aug-parity A/B (10k iters, same seeds).
timeout 3600 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10kdev --aug_mode device \
  --steps_per_call 10 > model/r3_ab_device.log 2>&1
timeout 10800 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 10000 --exp ACDC_ab10khost --aug_mode host \
  --device_data 0 > model/r3_ab_host.log 2>&1
echo CHAIN_R3_DONE
