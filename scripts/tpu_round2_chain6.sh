#!/bin/bash
# Round-2 TPU chain, part 4: banded-conv lowering A/B on the real chip.
set -x
cd /root/repo

WSL4MIS_CONV_IMPL=banded BENCH_METHOD=fully_supervised timeout 1800 \
  python bench.py > model/bench_fullsup_banded.json \
  2> model/bench_fullsup_banded.err
WSL4MIS_CONV_IMPL=banded BENCH_METHOD=dmpls timeout 1800 \
  python bench.py > model/bench_dmpls_banded.json \
  2> model/bench_dmpls_banded.err
echo CHAIN6_DONE
