"""Scribble2Label — confidence-gated pseudo labels from an EMA probability
buffer over the whole training set.

Rebuilds /root/reference/code/train_s2l.py:100-255 and dataset_s2l.py:
  * supervision: CE(ignore=4) on scribbles;
  * after thr_iter (6000): pixels that are unscribbled (class 4) but whose
    EMA class probability exceeds thr_conf (0.8) get that class as a
    pseudo label; loss += 0.5 * CE(ignore=4) on those labels;
  * every period_iter (100) iterations the whole train set is re-inferred
    and the per-pixel 4-channel weight buffer updated with
    w = alpha * p + (1 - alpha) * w (alpha = 0.2).

TPU-native restructuring (SURVEY §7 "hard parts"): the reference keeps the
weight buffer as per-sample numpy arrays mutated on the host; here it is a
single device-resident (N, H, W, 4) array in state.extra, gathered per
batch (and co-augmented with the images on device), and refreshed by a
jitted batched inference sweep. The buffer lives at the 256x256 training
resolution rather than native resolution — the EMA and thresholding are
identical up to the order-0 resample the reference applies anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data import AcdcVolumeDataset, batch_iterator
from ...data.acdc import AcdcSliceDataset
from ...data.augment_device import augment_batch_s2l
from ...ops import losses
from ..config import TrainConfig
from .common import (
    MethodBundle,
    forward_train,
    make_model_and_state,
    split_rngs,
    train_vis,
)


def make_step(cfg: TrainConfig):
    thr_conf = cfg.thr_conf
    thr_iter = cfg.thr_iter

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(rng)
        weight_batch = state.extra["weight"][batch["index"]]
        imgs, scribbles, weights = augment_batch_s2l(
            rngs["aug"], batch["image"], batch["label"], weight_batch
        )
        x = imgs[..., None]

        def loss_fn(params):
            outputs, new_bs = forward_train(
                state.replace(params=params),
                x,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            loss_ce = losses.cross_entropy(outputs, scribbles, ignore_index=4)
            # confidence-gated pseudo labels on unscribbled pixels
            # (train_s2l.py:129-147): for each class c, unscribbled pixels
            # with EMA prob > thr get label c; later classes win ties.
            unscr = scribbles == 4
            u_labels = jnp.full_like(scribbles, 4)
            for c in range(4):
                u_labels = jnp.where(
                    unscr & (weights[..., c] > thr_conf), c, u_labels
                )
            loss_u = losses.cross_entropy(outputs, u_labels, ignore_index=4)
            use_u = (state.step >= thr_iter).astype(jnp.float32)
            loss = loss_ce + use_u * 0.5 * loss_u
            return loss, (loss_ce, loss_u, outputs, new_bs)

        (loss, (loss_ce, loss_u, outputs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_u": loss_u,
            "vis": train_vis(x, outputs, scribbles),
        }

    return step_fn


def make_refresh(cfg: TrainConfig, images: np.ndarray, refresh_bs: int = 32):
    """Jitted full-dataset EMA sweep (train_s2l.py:214-250 equivalent).

    The image stack is staged once and passed as a jit *argument* (baking
    it as a closure constant bloats the compile payload past the remote
    compiler's limits). Staging is lazy and sharding-aware: on a
    multi-device mesh the stack is placed with the same (replicated)
    sharding as the weight buffer, so the refresh is consistent with the
    data-parallel train step (the sweep itself is replicated — it runs
    every period_iter only, a negligible slice of the step budget).
    """
    n = images.shape[0]
    pad = (-n) % refresh_bs
    padded = np.concatenate(
        [images, np.zeros((pad, *images.shape[1:]), images.dtype)], axis=0
    )
    num_batches = padded.shape[0] // refresh_bs
    xs_host = padded.reshape(num_batches, refresh_bs, *images.shape[1:], 1)
    alpha = cfg.alpha
    cache: dict = {}

    @jax.jit
    def refresh_impl(state, xs):
        def body(_, x):
            out = state.apply_fn(state.variables, x, train=False)
            return None, jax.nn.softmax(out, axis=-1)

        _, preds = jax.lax.scan(body, None, xs)
        preds = preds.reshape(-1, *preds.shape[2:])[:n]
        new_weight = alpha * preds + (1 - alpha) * state.extra["weight"]
        return state.replace(extra={"weight": new_weight})

    def refresh(state):
        if "xs" not in cache:
            sharding = getattr(state.extra["weight"], "sharding", None)
            mesh = getattr(sharding, "mesh", None)
            if mesh is not None and mesh.devices.size > 1:
                from ...parallel.mesh import replicated_sharding

                cache["xs"] = jax.device_put(
                    xs_host, replicated_sharding(mesh)
                )
            else:
                cache["xs"] = jax.device_put(xs_host)
        return refresh_impl(state, cache["xs"])

    return refresh


def build(cfg: TrainConfig) -> MethodBundle:
    model, state = make_model_and_state(cfg)
    train = AcdcSliceDataset(
        base_dir=cfg.root_path, fold=cfg.fold, sup_type="scribble",
        patch_size=cfg.patch_size, limit=cfg.data_limit,
    )
    weight0 = jnp.zeros((len(train), *cfg.patch_size, 4), jnp.float32)
    state = state.replace(extra={"weight": weight0})
    val = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=cfg.fold,
        limit=(4 if cfg.data_limit else None),
    )
    it = batch_iterator(train, cfg.batch_size, seed=cfg.seed, include_index=True)
    refresh = make_refresh(cfg, train.images)

    def host_hook(bundle, state, iter_num):
        if iter_num > 0 and iter_num % cfg.period_iter == 0:
            return refresh(state)
        return state

    return MethodBundle(
        model=model,
        state=state,
        step_fn=make_step(cfg),
        data_iter=it,
        val_volumes=val,
        steps_per_epoch=len(train) // cfg.batch_size,
        host_hook=host_hook,
    )
