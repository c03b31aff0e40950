#!/usr/bin/env python
"""pCE + inter/intra-class intensity variance — reference-named CLI alias
(reference: code/train_weakly_supervised_pCE_Inter&Intra_Class_2D.py).

The `&` in the reference filename is shell-hostile (must be quoted), so the
canonical shim lives at train_weakly_supervised_pCE_Intensity_Variance_2D.py;
this alias keeps the exact reference script name for CLI-contract parity
(BASELINE.json "keeping the reference train/test script CLI").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.cli import train_main

METHOD = 'pce_intensity_variance'
DEFAULTS = {'exp': 'ACDC_pCE_Inter_Intra_Class', 'fold': 'fold1', 'sup_type': 'scribble', 'batch_size': 24, 'base_lr': 0.01, 'max_iterations': 30000, 'seed': 2022}

if __name__ == "__main__":
    print(train_main(METHOD, DEFAULTS))
