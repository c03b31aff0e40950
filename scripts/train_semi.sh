#!/bin/bash
# Semi-supervised fan-out (reference: code/train_semi.sh).
exec python "$(dirname "$0")/launch_experiments.py" --suite semi --folds "${1:-all}" --extra "${@:2}"
