#!/bin/bash
# Round-2 TPU chain, part 3: the flagship ScribbleVC quality run with the
# bbox-cropped (exact) fast surface-distance metrics, then its held-out
# test table, then serving-path throughput.
set -x
cd /root/repo

timeout 13200 python scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
  > model/scribblevc_run.log 2>&1
timeout 2400 python scripts/test_ACDC_scribblevc.py \
  > model/scribblevc_test.log 2>&1
timeout 1500 python scripts/bench_infer.py \
  > model/bench_infer.json 2> model/bench_infer.err
BENCH_MODEL=unet_cct timeout 1500 python scripts/bench_infer.py \
  > model/bench_infer_cct.json 2> model/bench_infer_cct.err
echo CHAIN5_DONE
