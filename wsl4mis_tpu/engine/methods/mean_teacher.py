"""Semi-supervised family: mean teacher, UAMT, entropy minimization,
partially-supervised baseline.

Rebuilds four reference scripts that share the labeled/unlabeled two-stream
skeleton (labeled patients = multiples of 10 in the fold,
dataset_semi.py:27-34; two DataLoaders of batch_size//2 each,
train_mean_teacher_2D.py:106-115):

  * mean_teacher  — train_mean_teacher_2D.py:135-185
        supervised 0.5*(CE+Dice) on labeled; MSE(student_soft(unlab),
        teacher_soft(unlab+noise)) with weight 0.1*rampup(it//300, 200).
  * uamt          — train_uncertainty_aware_mean_teacher_2D.py:140-195
        + T=8 MC-noise teacher passes -> predictive entropy mask with
        ramped threshold (0.75+0.25*rampup(it,max))*ln2; masked MSE.
  * entropy_minimization — train_entropy_minimization_2D.py:125-145
        consistency = entropy_loss(unlabeled_soft, C=4) (no teacher).
  * partially_supervised — train_partially_fully_supervised.py:115-140
        supervised loss only (labeled subset baseline).

The snapshot's mean_teacher/UAMT never call update_ema_variables (SURVEY
§0.9); the intended per-step EMA (alpha=0.99, USTM-style) is applied here
as a jitted donated-buffer tree update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data import AcdcSliceDataset, AcdcVolumeDataset, paired_iterator
from ...ops import losses
from ..config import TrainConfig
from ..state import ema_update
from .common import (
    MethodBundle,
    forward_train,
    make_model_and_state,
    prep_batch,
    resolve_labeled_bs,
    sigmoid_rampup_jnp,
    split_rngs,
    train_vis,
)


def clamped_noise(rng, shape, dtype=jnp.float32):
    """torch.clamp(randn*0.1, -0.2, 0.2) (train_mean_teacher_2D.py:147-149)."""
    return jnp.clip(jax.random.normal(rng, shape, dtype) * 0.1, -0.2, 0.2)


def teacher_forward(state, ema_params, x, rng):
    """EMA-teacher forward in train mode (dropout on, batch-stat
    normalization), discarding stat mutations — matches torch's
    ema_model.train() + no_grad usage."""
    out, _ = state.apply_fn(
        {"params": ema_params, "batch_stats": state.batch_stats},
        x,
        train=True,
        rngs={"dropout": rng, "feature_perturb": rng},
        mutable=["batch_stats"],
    )
    return jax.lax.stop_gradient(out)


def make_step(cfg: TrainConfig):
    method = cfg.method
    num_classes = cfg.num_classes
    labeled_bs = resolve_labeled_bs(cfg)

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(
            rng, ("aug", "dropout", "dropout2", "feature_perturb", "noise", "mc")
        )
        x, labels = prep_batch(rngs["aug"], batch)
        x_lab, y_lab = x[:labeled_bs], labels[:labeled_bs]
        x_unlab = x[labeled_bs:]

        ema_params = state.extra["ema_params"] if state.extra else None

        def loss_fn(params):
            st = state.replace(params=params)
            out_lab, bs1 = forward_train(
                st,
                x_lab,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            probs_lab = jax.nn.softmax(out_lab, axis=-1)
            loss_ce = losses.cross_entropy(out_lab, y_lab)
            loss_dice = losses.dice_loss(probs_lab, y_lab, num_classes)
            supervised = 0.5 * (loss_ce + loss_dice)

            if method == "partially_supervised":
                return supervised, (
                    loss_ce, loss_dice, jnp.float32(0.0), out_lab, bs1
                )

            out_unlab, bs2 = forward_train(
                st.replace(batch_stats=bs1),
                x_unlab,
                {"dropout": rngs["dropout2"], "feature_perturb": rngs["feature_perturb"]},
            )
            probs_unlab = jax.nn.softmax(out_unlab, axis=-1)

            if method == "entropy_minimization":
                consistency = losses.entropy_loss(probs_unlab, num_classes)
            else:
                noise = clamped_noise(rngs["noise"], x_unlab.shape, x_unlab.dtype)
                ema_out = teacher_forward(
                    state, ema_params, x_unlab + noise, rngs["noise"]
                )
                if method == "mean_teacher":
                    ema_soft = jax.nn.softmax(ema_out, axis=-1)
                    consistency = jnp.mean((probs_unlab - ema_soft) ** 2)
                elif method == "uamt":
                    dist = losses.softmax_mse_loss(out_unlab, ema_out)
                    unc = _uamt_uncertainty(
                        state, ema_params, x_unlab, rngs["mc"], num_classes
                    )
                    thresh = (
                        0.75
                        + 0.25 * sigmoid_rampup_jnp(state.step, cfg.max_iterations)
                    ) * jnp.log(2.0)
                    mask = (unc < thresh).astype(jnp.float32)
                    consistency = jnp.sum(mask * dist) / (
                        2 * jnp.sum(mask) + 1e-16
                    )
                else:
                    raise ValueError(method)

            weight = cfg.consistency * sigmoid_rampup_jnp(
                state.step // 300, cfg.consistency_rampup
            )
            loss = supervised + weight * consistency
            return loss, (loss_ce, loss_dice, consistency, out_lab, bs2)

        (loss, (loss_ce, loss_dice, consistency, out_lab, new_bs)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        extra = state.extra
        state = state.apply_gradients(grads, batch_stats=new_bs)
        if extra is not None:
            new_ema = ema_update(
                extra["ema_params"], state.params, cfg.ema_decay, state.step
            )
            state = state.replace(extra={"ema_params": new_ema})
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_dice": loss_dice,
            "consistency_loss": consistency,
            "vis": train_vis(x_lab, out_lab, y_lab),
        }

    return step_fn


def _uamt_uncertainty(state, ema_params, x_unlab, rng, num_classes, T=8):
    tiled = jnp.concatenate([x_unlab, x_unlab], axis=0)
    keys = jax.random.split(rng, T // 2)

    def one_pass(acc, key):
        knoise, kdrop = jax.random.split(key)
        noisy = tiled + clamped_noise(knoise, tiled.shape, tiled.dtype)
        out = teacher_forward(state, ema_params, noisy, kdrop)
        return acc + jax.nn.softmax(out, axis=-1), None

    init = jnp.zeros((*tiled.shape[:-1], num_classes), jnp.float32)
    acc, _ = jax.lax.scan(one_pass, init, keys)
    b = x_unlab.shape[0]
    preds = (acc[:b] + acc[b:]) / T
    return -jnp.sum(preds * jnp.log(preds + 1e-6), axis=-1, keepdims=True)


def build(cfg: TrainConfig) -> MethodBundle:
    needs_teacher = cfg.method in ("mean_teacher", "uamt")
    model, state = make_model_and_state(cfg)
    if needs_teacher:
        state = state.replace(
            extra={"ema_params": jax.tree.map(jnp.copy, state.params)}
        )
    labeled = AcdcSliceDataset(
        base_dir=cfg.root_path, fold=cfg.fold, sup_type="label",
        labeled_type="labeled", patch_size=cfg.patch_size,
        limit=cfg.data_limit,
    )
    unlabeled = AcdcSliceDataset(
        base_dir=cfg.root_path, fold=cfg.fold, sup_type="label",
        labeled_type="unlabeled", patch_size=cfg.patch_size,
        limit=cfg.data_limit,
    )
    val = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=cfg.fold,
        limit=(4 if cfg.data_limit else None),
    )
    labeled_bs = resolve_labeled_bs(cfg)
    unlabeled_bs = cfg.batch_size - labeled_bs
    it = paired_iterator(
        labeled, unlabeled, labeled_bs, unlabeled_bs, seed=cfg.seed
    )
    spe = len(unlabeled) // unlabeled_bs
    return MethodBundle(
        model=model,
        state=state,
        step_fn=make_step(cfg),
        data_iter=it,
        val_volumes=val,
        steps_per_epoch=spe,
    )
