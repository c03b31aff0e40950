#!/usr/bin/env python
"""ScribbleVC training on ACDC (reference: code/train_ACDC_scribblevc.py).

Epoch-based schedule: 200 epochs over the MAAG fold, AdamW 5e-4,
validation every epoch with the CAM decision rule.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.engine.trainer import Trainer

parser = argparse.ArgumentParser()
parser.add_argument("--root_path", type=str, default=None)
parser.add_argument("--exp", type=str, default="ACDC_ScribbleVC")
parser.add_argument("--fold", type=str, default="MAAGfold")
parser.add_argument("--sup_type", type=str, default="scribble")
parser.add_argument("--num_classes", type=int, default=4)
parser.add_argument("--batch_size", type=int, default=6)
parser.add_argument("--max_epoches", type=int, default=200)
parser.add_argument("--val_every_epoches", type=int, default=1)
parser.add_argument("--lr", type=float, default=5e-4)
parser.add_argument("--seed", type=int, default=2022)
parser.add_argument("--patch_size", type=str, default="[256, 256]")
parser.add_argument("--compute_dtype", type=str, default="bfloat16")
parser.add_argument("--snapshot_root", type=str, default="model")
parser.add_argument("--data_limit", type=int, default=None)
parser.add_argument("--steps_per_call", type=int, default=1,
                    help="scan K train steps inside one device call")
parser.add_argument("--remat", type=int, default=0,
                    help="checkpoint conformer stages (HBM for FLOPs)")
parser.add_argument("--pretrain_weights", type=str, default="",
                    help="msgpack checkpoint to warm-start from "
                         "(reference train_ACDC_scribblevc.py:154-156)")
parser.add_argument("--light_val", type=int, default=0,
                    help="1: skip the train-rule val pass (selection uses "
                         "the select-rule metric; halves val wall-clock)")
parser.add_argument("--resume", type=int, default=0,
                    help="1: resume from latest_full.ckpt if present")
parser.add_argument("--ckpt_epoches", type=int, default=100,
                    help="full-state checkpoint cadence in epochs "
                         "(reference snapshots every 100)")

if __name__ == "__main__":
    import ast

    args = parser.parse_args()
    cfg = TrainConfig(
        root_path=args.root_path,
        exp=args.exp,
        fold=args.fold,
        sup_type=args.sup_type,
        model="scribblevc",
        num_classes=args.num_classes,
        batch_size=args.batch_size,
        base_lr=args.lr,
        patch_size=tuple(ast.literal_eval(args.patch_size)),
        seed=args.seed,
        method="scribblevc",
        compute_dtype=args.compute_dtype,
        snapshot_root=args.snapshot_root,
        data_limit=args.data_limit,
        steps_per_call=args.steps_per_call,
        remat=bool(args.remat),
        max_iterations=1,  # fixed up after the dataset size is known
    )
    bundle = get_method("scribblevc").build(cfg)
    if args.pretrain_weights:
        from wsl4mis_tpu.utils.checkpoint import load_checkpoint

        restored = load_checkpoint(args.pretrain_weights)
        print("Load pretrain weight from", args.pretrain_weights)
        bundle.state = bundle.state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", bundle.state.batch_stats),
        )
    cfg = cfg.replace(
        max_iterations=args.max_epoches * bundle.steps_per_epoch,
        val_every=args.val_every_epoches * bundle.steps_per_epoch,
        ckpt_every=args.ckpt_epoches * bundle.steps_per_epoch,
        light_val=bool(args.light_val),
        resume=bool(args.resume),
    )
    print(Trainer(cfg, bundle).train())
