#!/bin/bash
# Round-4 TPU chain B — launched by a watcher when chain A prints
# CHAIN_R4A_DONE:
#   1. Pallas-maxpool A/B on the step bench (VERDICT r3 item 1 — the
#      relayout-row attack; both strided and reshape compact lowerings)
#   2. ScribbleVC 200ep, light_val + val every 2 epochs (val dominated
#      round-3 wall-clock at ~126 s/val; selection uses the select-rule
#      metric which light_val keeps), deadline-aware timeout
#   3. Held-out test protocol on the best checkpoint
set -x
cd /root/repo
mkdir -p model

DEADLINE=1787133860           # round start + 9h (PROGRESS.jsonl wall_s)
RESERVE=2300                  # test stage + driver bench slack

# run_watch <logfile> <timeout_s> <stale_s> <resume_flag|-> <cmd...>
run_watch() {
  local log=$1 tmo=$2 stale=$3 resume=$4; shift 4
  local rc=1
  for attempt in 1 2 3 4; do
    local extra=()
    if [ "$resume" != "-" ] && [ "$attempt" -gt 1 ]; then
      extra=("$resume" "1")
    fi
    timeout "$tmo" "$@" "${extra[@]}" > "$log.$attempt" 2> "$log.$attempt.err" &
    local tpid=$!
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      local now m
      now=$(date +%s)
      m=$(stat -c %Y "$log.$attempt" 2>/dev/null || echo "$now")
      if [ $((now - m)) -gt "$stale" ]; then
        echo "stale ${stale}s on attempt $attempt, killing" >> "$log.err"
        pkill -P "$tpid"
        sleep 5
        kill "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid"; rc=$?
    cat "$log.$attempt" >> "$log" 2>/dev/null
    cat "$log.$attempt.err" >> "$log.err" 2>/dev/null
    if [ "$rc" -eq 0 ]; then
      return 0
    fi
    sleep 60
  done
  return "$rc"
}

# chain A's test guard checked a wrong snapshot path (exp contains a
# slash: model/ACDC/pCE_SPS_fold1); run the DMPLS offline test here if
# the checkpoint exists and chain A skipped it.
if [ -f model/ACDC/pCE_SPS_fold1/scribble/iter_60000.pth ]; then
  run_watch model/r4_dmpls_testB_fold1.log 2100 600 - python \
    scripts/test_2D_fully_sps.py --fold fold1 --no_save
fi

WSL4MIS_POOL_IMPL=pallas run_watch model/r4_bench_pool_pallas.json \
  900 420 - python bench.py
WSL4MIS_POOL_IMPL=pallas WSL4MIS_POOL_COMPACT=reshape run_watch \
  model/r4_bench_pool_pallas_rs.json 900 420 - python bench.py
# does killing the relayout seam move the dispatch-amortization optimum?
WSL4MIS_POOL_IMPL=pallas BENCH_BATCH=48 run_watch \
  model/r4_bench_pool_pallas_b48.json 900 420 - python bench.py

# fresh step trace with the Pallas pool (formatting-row attribution),
# only if its bench compiled+ran
if grep -q '"metric"' model/r4_bench_pool_pallas.json.1 2>/dev/null; then
  WSL4MIS_POOL_IMPL=pallas TRACE_METHOD=fully_supervised \
    TRACE_DIR=/tmp/trace_r4pool run_watch model/r4_trace_pool.log 1500 600 - \
    python scripts/capture_trace.py
fi

NOW=$(date +%s)
TMO=$((DEADLINE - NOW - RESERVE))
if [ "$TMO" -gt 1800 ]; then
  run_watch model/r4_scribblevc_run.log "$TMO" 600 --resume python \
    scripts/train_ACDC_scribblevc.py --steps_per_call 5 \
    --val_every_epoches 2 --light_val 1 --ckpt_epoches 25
fi

if [ -f model/ACDC_ScribbleVC_MAAGfold/scribble/scribblevc_best_model.pth ]; then
  run_watch model/r4_scribblevc_test.log 1500 600 - python \
    scripts/test_ACDC_scribblevc.py
fi

# conv-ceiling rerun (fixed fence, VERDICT item 7) only if slack remains
NOW=$(date +%s)
if [ $((DEADLINE - NOW)) -gt 1900 ]; then
  run_watch model/r4_bench_conv.json $((DEADLINE - NOW - 400)) 600 - \
    python scripts/bench_conv.py
fi

echo CHAIN_R4B_DONE
