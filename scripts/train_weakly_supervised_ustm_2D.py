#!/usr/bin/env python
"""USTM transform-consistent mean teacher on scribbles (reference: code/train_weakly_supervised_ustm_2D.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'ustm'
DEFAULTS = {'exp': 'ACDC/pCE_Seg_USTM', 'fold': 'fold1', 'sup_type': 'scribble', 'batch_size': 12, 'base_lr': 0.01, 'max_iterations': 60000, 'seed': 2022}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
