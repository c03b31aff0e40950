#!/bin/bash
# Round-2 TPU job chain (one TPU process at a time):
#   1. ScribbleVC ACDC MAAGfold, 200 epochs (VERDICT item 2)
#   2. Augmentation-parity A/B: pCE fold1 3k iters, device vs host aug
#      (VERDICT item 8)
#   3. bench.py for the BASELINE configs (VERDICT item 3)
set -x
cd /root/repo

python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/scribblevc_run.log 2>&1

python scripts/train_weakly_supervised_pCE_2D.py --max_iterations 3000 \
  --exp ACDC_abdev --aug_mode device \
  > model/ab_device.log 2>&1
python scripts/train_weakly_supervised_pCE_2D.py --max_iterations 3000 \
  --exp ACDC_abhost --aug_mode host --device_data 0 \
  > model/ab_host.log 2>&1

python bench.py > model/bench_dmpls.json 2> model/bench_dmpls.err
BENCH_METHOD=fully_supervised python bench.py \
  > model/bench_fullsup.json 2> model/bench_fullsup.err
BENCH_METHOD=pce_gatedcrf python bench.py \
  > model/bench_gatedcrf.json 2> model/bench_gatedcrf.err
BENCH_METHOD=pce python bench.py > model/bench_pce.json 2> model/bench_pce.err
BENCH_METHOD=scribblevc python bench.py \
  > model/bench_scribblevc.json 2> model/bench_scribblevc.err
echo CHAIN_DONE
