"""Shared plumbing for method step functions."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

from ...data import (
    AcdcSliceDataset,
    AcdcVolumeDataset,
    augment_batch,
    batch_iterator,
)
from ...models import init_model, net_factory
from ...ops import losses
from ..config import TrainConfig
from ..optim import reference_sgd
from ..state import TrainState


@dataclass
class MethodBundle:
    """Everything the Trainer needs to run one method."""

    model: Any                      # linen module used for train + val
    state: TrainState
    step_fn: Callable               # (state, batch, rng) -> (state, metrics)
    data_iter: Iterator[dict]       # host batches of numpy arrays
    val_volumes: AcdcVolumeDataset
    steps_per_epoch: int
    host_hook: Callable | None = None   # (bundle, state, iter_num) -> state
    predictor: Any | None = None        # VolumePredictor override
    val_variables: Callable | None = None  # (state) -> variables dict


def compute_dtype(cfg: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def make_model_and_state(cfg: TrainConfig, *, model_name=None, extra=None,
                         tx=None):
    model = net_factory(
        model_name or cfg.model, cfg.num_classes, dtype=compute_dtype(cfg)
    )
    rng = jax.random.key(cfg.seed)
    variables = init_model(model, rng, (1, *cfg.patch_size, 1))
    tx = tx or reference_sgd(cfg.base_lr, cfg.max_iterations)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
        extra=extra,
    )
    return model, state


def standard_data(cfg: TrainConfig, **ds_kwargs):
    """Single-stream scribble/label dataset + fold val volumes."""
    train = AcdcSliceDataset(
        base_dir=cfg.root_path,
        fold=cfg.fold,
        sup_type=cfg.sup_type,
        patch_size=cfg.patch_size,
        limit=cfg.data_limit,
        **ds_kwargs,
    )
    val = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=cfg.fold,
        limit=(4 if cfg.data_limit else None),
    )
    it = batch_iterator(train, cfg.batch_size, seed=cfg.seed)
    steps_per_epoch = len(train) // cfg.batch_size
    return train, val, it, steps_per_epoch


def prep_batch(rng, batch):
    """On-device augmentation + NHWC expansion. Returns (x, labels)."""
    imgs, labs = augment_batch(rng, batch["image"], batch["label"])
    return imgs[..., None], labs


def forward_train(state, x, rngs):
    """Apply with mutable batch_stats; returns (outputs, new_batch_stats)."""
    out, mut = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        x,
        train=True,
        rngs=rngs,
        mutable=["batch_stats"],
    )
    return out, mut["batch_stats"]


def supervised_ce_dice(outputs, labels, num_classes: int):
    """0.5 * (CE(ignore=4) + Dice) — the reference's supervised loss
    (train_fully_supervised_2D.py:100-102)."""
    probs = jax.nn.softmax(outputs, axis=-1)
    loss_ce = losses.cross_entropy(outputs, labels, ignore_index=4)
    loss_dice = losses.dice_loss(probs, labels, num_classes)
    return 0.5 * (loss_ce + loss_dice), loss_ce, loss_dice


def sigmoid_rampup_jnp(current, rampup_length: float):
    """jnp version of ramps.sigmoid_rampup for in-step consistency weights."""
    if rampup_length == 0:
        return jnp.float32(1.0)
    cur = jnp.clip(current.astype(jnp.float32), 0.0, rampup_length)
    phase = 1.0 - cur / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def split_rngs(rng, names=("aug", "dropout", "feature_perturb", "method")):
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))
