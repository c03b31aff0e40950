#!/bin/bash
# Round-2 TPU chain #2:
#   1. ScribbleVC ACDC 200-epoch run (relaunch after the Pallas nf fix)
#   2. DMPLS folds 2-5 (fold1 trained in round 1) with K=10 step fusion
#   3. 5-fold DMPLS offline test table (test_2D_fully protocol)
set -x
cd /root/repo

python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/scribblevc_run.log 2>&1

for FOLD in fold2 fold3 fold4 fold5; do
  python scripts/train_weakly_supervised_segmentation_pCE_ours_proposed.py \
    --fold $FOLD --steps_per_call 10 \
    > model/dmpls_$FOLD.log 2>&1
done

python scripts/test_2D_fully_sps.py --fold all --no_save \
  > model/dmpls_5fold_test.log 2>&1
echo CHAIN2_DONE
