"""Shared CLI for the per-method train scripts.

Replaces the ~15 duplicated argparse blocks of the reference (SURVEY §5.6)
with one builder; each thin script under scripts/ passes its own defaults
(matching the corresponding reference script's argparse defaults) and a
method name. Flag names are kept verbatim from the reference CLI
(train_fully_supervised_2D.py:29-53) so launch commands port unchanged.
"""

from __future__ import annotations

import argparse
import ast
import logging
import os

from .engine.config import TrainConfig


def build_parser(defaults: dict) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    add = p.add_argument
    add("--root_path", type=str, default=defaults.get("root_path"),
        help="ACDC data root (default: auto-discover)")
    add("--exp", type=str, default=defaults.get("exp", "ACDC"))
    add("--fold", type=str, default=defaults.get("fold", "fold1"))
    add("--sup_type", type=str, default=defaults.get("sup_type", "label"))
    add("--model", type=str, default=defaults.get("model", "unet"))
    add("--num_classes", type=int, default=4)
    add("--max_iterations", type=int,
        default=defaults.get("max_iterations", 30000))
    add("--batch_size", type=int, default=defaults.get("batch_size", 16))
    add("--deterministic", type=int, default=1)
    add("--base_lr", type=float, default=defaults.get("base_lr", 0.03))
    add("--patch_size", type=str, default="[256, 256]",
        help="patch size, e.g. [256,256]")
    add("--seed", type=int, default=defaults.get("seed", 2022))
    # semi-supervised / method-specific flags (harmless elsewhere)
    add("--labeled_bs", type=int, default=defaults.get("labeled_bs", 6))
    add("--ema_decay", type=float, default=0.99)
    add("--consistency", type=float, default=0.1)
    add("--consistency_rampup", type=float, default=200.0)
    add("--thr_iter", type=int, default=6000)
    add("--thr_conf", type=float, default=0.8)
    add("--period_iter", type=int, default=100)
    add("--alpha", type=float, default=0.2)
    # rebuild-specific
    add("--val_every", type=int, default=200)
    add("--ckpt_every", type=int, default=3000)
    add("--log_every", type=int, default=1)
    add("--steps_per_call", type=int, default=1,
        help="fuse K train steps per device call (lax.scan)")
    add("--compute_dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"])
    add("--snapshot_root", type=str, default="model")
    add("--num_devices", type=int, default=None)
    add("--resume", action="store_true")
    add("--profile_steps", type=int, default=0)
    add("--data_limit", type=int, default=None)
    add("--aug_mode", type=str, default="device", choices=["device", "host"],
        help="device: in-step augmentation; host: exact reference "
             "augment-then-zoom semantics on the host")
    add("--device_data", type=int, default=1,
        help="1: stage the dataset in device HBM (index batches); 0: ship "
             "host image batches per step")
    add("--remat", type=int, default=0,
        help="checkpoint ScribbleVC conformer stages (HBM for FLOPs)")
    add("--fast_prng", type=int, default=1,
        help="1: rbg step PRNG (TPU-fast); 0: threefry")
    add("--encoder_weights", type=str, default=None,
        help="efficient_unet: converted ImageNet encoder msgpack "
             "(scripts/convert_torch_weights.py)")
    return p


def config_from_args(args, method: str) -> TrainConfig:
    patch = args.patch_size
    if isinstance(patch, str):
        patch = tuple(ast.literal_eval(patch))
    root = args.root_path
    if root is not None and not os.path.isdir(root):
        logging.warning("root_path %s not found; auto-discovering", root)
        root = None
    return TrainConfig(
        root_path=root,
        exp=args.exp,
        fold=args.fold,
        sup_type=args.sup_type,
        model=args.model,
        num_classes=args.num_classes,
        max_iterations=args.max_iterations,
        batch_size=args.batch_size,
        deterministic=args.deterministic,
        base_lr=args.base_lr,
        patch_size=patch,
        seed=args.seed,
        labeled_bs=args.labeled_bs,
        ema_decay=args.ema_decay,
        consistency=args.consistency,
        consistency_rampup=args.consistency_rampup,
        thr_iter=args.thr_iter,
        thr_conf=args.thr_conf,
        period_iter=args.period_iter,
        alpha=args.alpha,
        method=method,
        val_every=args.val_every,
        ckpt_every=args.ckpt_every,
        log_every=args.log_every,
        steps_per_call=args.steps_per_call,
        compute_dtype=args.compute_dtype,
        snapshot_root=args.snapshot_root,
        num_devices=args.num_devices,
        resume=args.resume,
        profile_steps=args.profile_steps,
        data_limit=args.data_limit,
        aug_mode=args.aug_mode,
        device_data=bool(args.device_data),
        fast_prng=bool(args.fast_prng),
        remat=bool(args.remat),
        encoder_weights=args.encoder_weights,
    )


def train_main(method: str, defaults: dict, argv=None) -> str:
    from .engine.methods import get_method
    from .engine.trainer import Trainer

    args = build_parser(defaults).parse_args(argv)
    cfg = config_from_args(args, method)
    bundle = get_method(method).build(cfg)
    trainer = Trainer(cfg, bundle)
    logging.info(str(args))
    return trainer.train()
