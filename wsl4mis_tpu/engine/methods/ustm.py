"""USTM — Uncertainty-aware Self-ensembling and Transformation-consistent
Mean teacher on scribbles.

Rebuilds /root/reference/code/train_weakly_supervised_ustm_2D.py:100-170:
pCE supervision; a random rot90 of the batch feeds the EMA teacher
(+clamped Gaussian noise); rot90-equivariant consistency between the
rotated student output and the teacher output, masked by the teacher's
MC predictive entropy under a ramped threshold; EMA alpha=0.99 per step;
consistency weight = 1.0 * sigmoid_rampup(it//1000, 60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import losses
from ..config import TrainConfig
from ..state import ema_update
from .common import (
    MethodBundle,
    forward_train,
    make_model_and_state,
    prep_batch,
    sigmoid_rampup_jnp,
    split_rngs,
    stage_dataset,
    standard_data,
    train_vis,
)
from .mean_teacher import clamped_noise, teacher_forward


def _rot90_batch(x, k):
    """rot90 of NHWC batches by traced k (spatial dims), torch dims [2,3].

    torch.rot90(x, k, dims=[2, 3]) rotates in the (H, W) plane; jnp.rot90
    with axes (1, 2) on NHWC matches.
    """
    return jax.lax.switch(
        k,
        [
            lambda a: a,
            lambda a: jnp.rot90(a, 1, axes=(1, 2)),
            lambda a: jnp.rot90(a, 2, axes=(1, 2)),
            lambda a: jnp.rot90(a, 3, axes=(1, 2)),
        ],
        x,
    )


def make_step(cfg: TrainConfig):
    num_classes = cfg.num_classes
    T = 8

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(
            rng, ("aug", "dropout", "feature_perturb", "rot", "noise", "mc")
        )
        x, labels = prep_batch(
            rngs["aug"], batch, aux, augment=cfg.aug_mode != "host"
        )
        rot_times = jax.random.randint(rngs["rot"], (), 0, 4)
        x_rot = _rot90_batch(x, rot_times)
        ema_params = state.extra["ema_params"]

        # teacher pass on rotated+noised input
        ema_out = teacher_forward(
            state, ema_params,
            x_rot + clamped_noise(rngs["noise"], x_rot.shape, x_rot.dtype),
            rngs["noise"],
        )

        # MC uncertainty over T noisy passes of the doubled rotated batch
        tiled = jnp.concatenate([x_rot, x_rot], axis=0)
        keys = jax.random.split(rngs["mc"], T // 2)

        def one_pass(acc, key):
            kn, kd = jax.random.split(key)
            noisy = tiled + clamped_noise(kn, tiled.shape, tiled.dtype)
            out = teacher_forward(state, ema_params, noisy, kd)
            return acc + jax.nn.softmax(out, axis=-1), None

        acc, _ = jax.lax.scan(
            one_pass, jnp.zeros((*tiled.shape[:-1], num_classes), jnp.float32), keys
        )
        b = x.shape[0]
        preds = (acc[:b] + acc[b:]) / T
        uncertainty = -jnp.sum(
            preds * jnp.log(preds + 1e-6), axis=-1, keepdims=True
        )
        threshold = (
            0.75 + 0.25 * sigmoid_rampup_jnp(state.step, cfg.max_iterations)
        ) * jnp.log(2.0)
        mask = (uncertainty < threshold).astype(jnp.float32)
        consistency_weight = 1.0 * sigmoid_rampup_jnp(state.step // 1000, 60.0)

        def loss_fn(params):
            outputs, new_bs = forward_train(
                state.replace(params=params),
                x,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            loss_ce = losses.cross_entropy(outputs, labels, ignore_index=4)
            rotated_outputs = _rot90_batch(outputs, rot_times)
            dist = losses.softmax_mse_loss(rotated_outputs, ema_out)
            consistency = jnp.sum(mask * dist) / (2 * jnp.sum(mask) + 1e-16)
            loss = loss_ce + consistency_weight * consistency
            return loss, (loss_ce, consistency, outputs, new_bs)

        (loss, (loss_ce, consistency, outputs, new_bs)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        state = state.apply_gradients(grads, batch_stats=new_bs)
        new_ema = ema_update(
            state.extra["ema_params"], state.params, 0.99, state.step
        )
        state = state.replace(extra={"ema_params": new_ema})
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "consistency_loss": consistency,
            "vis": train_vis(x, outputs, labels),
        }

    return step_fn


def build(cfg: TrainConfig) -> MethodBundle:
    model, state = make_model_and_state(cfg)
    state = state.replace(
        extra={"ema_params": jax.tree.map(jnp.copy, state.params)}
    )
    train, val, it, spe = standard_data(cfg)
    return MethodBundle(
        model=model,
        state=state,
        step_fn=make_step(cfg),
        aux=stage_dataset(cfg, train),
        data_iter=it,
        val_volumes=val,
        steps_per_epoch=spe,
    )
