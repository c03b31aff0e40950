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
    aux: Any = None                     # extra device buffers passed to the
                                        # step as arguments (e.g. the staged
                                        # dataset) — never baked as jit
                                        # constants (huge compile payloads)
    nan_val_metrics: bool = False       # ScribbleVC NaN-mean val conventions
                                        # (val_2D_scribblevc.py:15-28)
    dice_snapshot_threshold: float | None = None
                                        # save a {model}_{dice}_model.pth
                                        # snapshot whenever val dice beats
                                        # this (train_ACDC_scribblevc.py:292-295)
    select_predictor: Any | None = None
                                        # optional second predictor whose
                                        # metric drives best-model selection
                                        # (e.g. ScribbleVC's test-time
                                        # mean-softmax rule; the main
                                        # predictor keeps the reference
                                        # training-val rule for logging)
    select_variables: Callable | None = None  # (state) -> variables for
                                        # select_predictor (defaults to
                                        # val_variables)
    eval_extra: tuple = ()              # state.extra keys the eval-time
                                        # forward needs; persisted into
                                        # inference checkpoints
    lr_schedule: Callable | None = None  # (step) -> lr for logging; defaults
                                        # to the poly schedule


def compute_dtype(cfg: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def make_model_and_state(cfg: TrainConfig, *, model_name=None, extra=None,
                         tx=None):
    model = net_factory(
        model_name or cfg.model, cfg.num_classes, dtype=compute_dtype(cfg)
    )
    rng = jax.random.key(cfg.seed)
    variables = init_model(model, rng, (1, *cfg.patch_size, 1))
    if cfg.encoder_weights and (model_name or cfg.model) == "efficient_unet":
        # ImageNet warm start via a converted efficientnet_pytorch file
        # (the reference's net_factory.py:16 default, recovered offline
        # through scripts/convert_torch_weights.py)
        from wsl4mis_tpu.utils.checkpoint import load_checkpoint
        from wsl4mis_tpu.utils.torch_import import merge_encoder_subtrees

        payload = load_checkpoint(cfg.encoder_weights)
        variables = merge_encoder_subtrees(
            variables, payload["encoder_params"],
            payload["encoder_batch_stats"],
        )
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
    """Single-stream scribble/label dataset + fold val volumes.

    With cfg.device_data (default), the pre-zoomed slice stack is staged
    once into device memory (ACDC: ~0.4 GB f32 + uint8 labels, far under
    one chip's HBM) and the host loop only ships a (B,) int index vector
    per step — the gather + augmentation run on device inside the jitted
    step, eliminating the per-step H2D image copy entirely.
    """
    host_aug = cfg.aug_mode == "host"
    train = AcdcSliceDataset(
        base_dir=cfg.root_path,
        fold=cfg.fold,
        sup_type=cfg.sup_type,
        patch_size=cfg.patch_size,
        limit=cfg.data_limit,
        keep_native=host_aug,
        **ds_kwargs,
    )
    val = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=cfg.fold,
        limit=(4 if cfg.data_limit else None),
    )
    if host_aug:
        it = _host_augmented_iterator(cfg, train)
    elif cfg.device_data:
        it = batch_iterator(
            train, cfg.batch_size, seed=cfg.seed, include_index=True,
        )
        it = ({"index": b["index"].astype("int32")} for b in it)
    else:
        it = batch_iterator(train, cfg.batch_size, seed=cfg.seed)
    steps_per_epoch = len(train) // cfg.batch_size
    return train, val, it, steps_per_epoch


def _host_augmented_iterator(cfg: TrainConfig, train: AcdcSliceDataset):
    """Exact reference augmentation path (aug at native res, then order-0
    zoom; dataset.py:147-166 semantics) on the host."""
    import numpy as np

    from ...data.augment import HostRandomGenerator

    gen = HostRandomGenerator(cfg.patch_size, seed=cfg.seed)
    it = batch_iterator(train, cfg.batch_size, seed=cfg.seed,
                        include_index=True)
    for b in it:
        imgs, labs = [], []
        for i in b["index"]:
            out = gen({
                "image": train.native_images[i],
                "label": train.native_labels[i],
            })
            imgs.append(out["image"])
            labs.append(out["label"])
        yield {"image": np.stack(imgs), "label": np.stack(labs)}


def stage_dataset(cfg: TrainConfig, train: AcdcSliceDataset):
    """Device-resident (images f32, labels uint8) arrays, or None."""
    if not cfg.device_data:
        return None
    import numpy as np

    return {
        "images": jax.device_put(train.images),
        "labels": jax.device_put(train.labels.astype(np.uint8)),
    }


_AUGMENT_FN = None


def _augment_impl():
    """Backend-selected batch augmentation (Pallas on TPU, XLA elsewhere),
    resolved once at first use so jax.devices() is only probed lazily."""
    global _AUGMENT_FN
    if _AUGMENT_FN is None:
        from ...data.augment_device import select_augment

        _AUGMENT_FN = select_augment()
    return _AUGMENT_FN


def prep_batch(rng, batch, staged=None, augment: bool = True):
    """On-device augmentation + NHWC expansion. Returns (x, labels).

    batch is either {'image','label'} host arrays (possibly already
    host-augmented, augment=False) or {'index'} with the dataset staged in
    device memory.
    """
    if staged is not None and "index" in batch:
        idx = batch["index"]
        images = jnp.take(staged["images"], idx, axis=0)
        labels = jnp.take(staged["labels"], idx, axis=0).astype(jnp.int32)
    else:
        images, labels = batch["image"], batch["label"]
    if augment:
        images, labels = _augment_impl()(rng, images, labels)
    return images[..., None], labels


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


def resolve_labeled_bs(cfg: TrainConfig) -> int:
    """The labeled/unlabeled batch split for the semi-supervised family:
    [labeled_bs labeled, batch_size - labeled_bs unlabeled].

    Honors --labeled_bs (train_mean_teacher_2D.py:58; the reference
    snapshot exposes the flag but hardwires batch_size//2 loaders at
    :112-115 — intent-fixed here; defaults (12, 6) coincide). A labeled_bs
    that leaves no unlabeled samples falls back to the half split.
    """
    if 0 < cfg.labeled_bs < cfg.batch_size:
        return cfg.labeled_bs
    return cfg.batch_size // 2


def train_vis(x, logits, labels):
    """Visualization tensors for the TB image triptych
    (train_fully_supervised_2D.py:121-130): batch element 1's input image,
    argmax prediction, and ground truth. Returned inside the step's metrics
    dict under the reserved key ``vis``; the Trainer fetches and writes them
    at the image cadence (every 20 iterations, reference tags
    train/Image, train/Prediction, train/GroundTruth)."""
    if isinstance(logits, (tuple, list)):
        logits = logits[0]
    i = 1 if x.shape[0] > 1 else 0
    return {
        "image": x[i, ..., 0].astype(jnp.float32),
        "pred": jnp.argmax(logits[i], axis=-1).astype(jnp.int32),
        "label": labels[i].astype(jnp.int32),
    }


def split_rngs(rng, names=("aug", "dropout", "feature_perturb", "method")):
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))
