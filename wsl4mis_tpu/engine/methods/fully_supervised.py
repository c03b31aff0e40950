"""Fully-supervised baseline (and random-walker pseudo-label training).

Rebuilds /root/reference/code/train_fully_supervised_2D.py:56-178 and
train_weakly_supervised_pCE_random_walker_2D.py (identical loss, different
sup_type): loss = 0.5 * (CE(ignore=4) + Dice) on the selected supervision
key, SGD(momentum 0.9, wd 1e-4) with per-step poly LR decay.
"""

from __future__ import annotations

import jax

from ..config import TrainConfig
from .common import (
    MethodBundle,
    stage_dataset,
    forward_train,
    make_model_and_state,
    prep_batch,
    split_rngs,
    standard_data,
    supervised_ce_dice,
    train_vis,
)


def make_step(cfg: TrainConfig):
    num_classes = cfg.num_classes

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(rng)
        x, labels = prep_batch(
            rngs["aug"], batch, aux, augment=cfg.aug_mode != "host"
        )

        def loss_fn(params):
            outputs, new_bs = forward_train(
                state.replace(params=params),
                x,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            loss, loss_ce, loss_dice = supervised_ce_dice(
                outputs, labels, num_classes
            )
            return loss, (loss_ce, loss_dice, outputs, new_bs)

        (loss, (loss_ce, loss_dice, outputs, new_bs)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_dice": loss_dice,
            "vis": train_vis(x, outputs, labels),
        }

    return step_fn


def build(cfg: TrainConfig) -> MethodBundle:
    model, state = make_model_and_state(cfg)
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
