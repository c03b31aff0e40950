#!/usr/bin/env python
"""Fully-supervised 2D UNet training (reference: code/train_fully_supervised_2D.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'fully_supervised'
DEFAULTS = {'exp': 'ACDC', 'fold': 'fold5', 'sup_type': 'label', 'batch_size': 16, 'base_lr': 0.03, 'max_iterations': 30000, 'seed': 2022}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
