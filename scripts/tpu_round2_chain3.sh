#!/bin/bash
# Round-2 TPU job chain (one TPU process at a time), ordered so the quick
# deliverables land first:
#   1. bench.py for every BASELINE config (VERDICT item 3)
#   2. Augmentation-parity A/B: pCE fold1 3k iters device vs host aug
#      (VERDICT item 8)
#   3. ScribbleVC ACDC MAAGfold, 200 epochs (VERDICT item 2)
#   4. DMPLS folds 2-5 (fold1 trained in round 1), K=10 step fusion
#   5. 5-fold DMPLS offline test table
set -x
cd /root/repo

for M in dmpls fully_supervised pce pce_gatedcrf scribblevc; do
  BENCH_METHOD=$M timeout 2400 python bench.py \
    > model/bench_$M.json 2> model/bench_$M.err
done

timeout 3600 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 3000 --exp ACDC_abdev --aug_mode device \
  --steps_per_call 10 > model/ab_device.log 2>&1
timeout 4800 python scripts/train_weakly_supervised_pCE_2D.py \
  --max_iterations 3000 --exp ACDC_abhost --aug_mode host --device_data 0 \
  > model/ab_host.log 2>&1

timeout 21600 python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/scribblevc_run.log 2>&1

# round-1 checkpoints were lost with the VM reset; train + test per fold
# so partial completion still yields offline-test rows
for FOLD in fold1 fold2 fold3 fold4 fold5; do
  timeout 7200 python \
    scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/dmpls_$FOLD.log 2>&1
  timeout 1800 python scripts/test_2D_fully_sps.py --fold $FOLD --no_save \
    > model/dmpls_test_$FOLD.log 2>&1
done
echo CHAIN3_DONE
