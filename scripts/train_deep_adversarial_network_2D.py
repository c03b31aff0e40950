#!/usr/bin/env python
"""Semi-supervised deep adversarial network (reference: code/train_deep_adversarial_network_2D.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'deep_adversarial'
DEFAULTS = {'exp': 'ACDC_Semi/DAN', 'fold': 'fold2', 'sup_type': 'label', 'batch_size': 12, 'base_lr': 0.01, 'max_iterations': 30000, 'seed': 2022, 'labeled_bs': 6}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
