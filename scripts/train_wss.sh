#!/bin/bash
# WSS zoo fan-out (reference: code/train_wss.sh) via the job-queue launcher.
exec python "$(dirname "$0")/launch_experiments.py" --suite wss --folds "${1:-all}" --extra "${@:2}"
