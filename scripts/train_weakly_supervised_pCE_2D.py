#!/usr/bin/env python
"""Scribble pCE training (reference: code/train_weakly_supervised_pCE_2D.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'pce'
DEFAULTS = {'exp': 'ACDC_pCE', 'fold': 'fold1', 'sup_type': 'scribble', 'batch_size': 24, 'base_lr': 0.03, 'max_iterations': 30000, 'seed': 2022}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
