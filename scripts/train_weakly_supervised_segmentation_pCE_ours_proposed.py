#!/usr/bin/env python
"""DMPLS dual-branch dynamically-mixed pseudo labels (reference: code/train_weakly_supervised_segmentation_pCE_ours_proposed.py)

Thin wrapper over wsl4mis_tpu.cli keeping the reference flag names.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'dmpls'
DEFAULTS = {'exp': 'ACDC/pCE_SPS', 'fold': 'fold1', 'sup_type': 'scribble', 'model': 'unet_cct', 'batch_size': 6, 'base_lr': 0.01, 'max_iterations': 60000, 'seed': 2022}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
