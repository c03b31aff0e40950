#!/usr/bin/env python
"""Offline test CLI for the dual-branch (DMPLS/unet_cct) model
(reference: code/test_2D_fully_sps.py — main-head argmax).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.eval.infer import InferenceConfig, run_inference

parser = argparse.ArgumentParser()
parser.add_argument("--root_path", type=str, default=None)
parser.add_argument("--exp", type=str, default="ACDC/pCE_SPS")
parser.add_argument("--model", type=str, default="unet_cct")
parser.add_argument("--fold", type=str, default="all")
parser.add_argument("--num_classes", type=int, default=4)
parser.add_argument("--sup_type", type=str, default="scribble")
parser.add_argument("--snapshot_root", type=str, default="model")
parser.add_argument("--checkpoint", type=str, default="iter_60000.pth")
parser.add_argument("--raw_data_path", type=str, default=None)
parser.add_argument("--no_save", action="store_true")
parser.add_argument("--compute_dtype", type=str, default="bfloat16")
parser.add_argument("--data_limit", type=int, default=None)

if __name__ == "__main__":
    FLAGS = parser.parse_args()
    folds = (
        ("fold1", "fold2", "fold3", "fold4", "fold5")
        if FLAGS.fold == "all"
        else (FLAGS.fold,)
    )
    cfg = InferenceConfig(
        root_path=FLAGS.root_path,
        exp=FLAGS.exp,
        model=FLAGS.model,
        sup_type=FLAGS.sup_type,
        num_classes=FLAGS.num_classes,
        snapshot_root=FLAGS.snapshot_root,
        checkpoint=FLAGS.checkpoint,
        raw_data_path=FLAGS.raw_data_path,
        save_predictions=not FLAGS.no_save,
        compute_dtype=FLAGS.compute_dtype,
        folds=folds,
        data_limit=FLAGS.data_limit,
    )
    run_inference(cfg)
