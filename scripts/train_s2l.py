#!/usr/bin/env python
"""Scribble2Label EMA pseudo labels (reference: code/train_s2l.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 's2l'
DEFAULTS = {'exp': 'ACDC/pCE_scribble2label', 'fold': 'fold1', 'sup_type': 'scribble', 'batch_size': 12, 'base_lr': 0.01, 'max_iterations': 60000, 'seed': 1337, 'labeled_bs': 6}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
