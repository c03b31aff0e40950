"""Partial cross-entropy on scribbles (pCE only).

Rebuilds /root/reference/code/train_weakly_supervised_pCE_2D.py:56-205:
loss = CrossEntropy(ignore_index=4) on the scribble supervision.
"""

from __future__ import annotations

import jax

from ...ops import losses
from ..config import TrainConfig
from .common import (
    MethodBundle,
    stage_dataset,
    forward_train,
    make_model_and_state,
    prep_batch,
    split_rngs,
    standard_data,
    train_vis,
)


def make_step(cfg: TrainConfig):
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
            loss_ce = losses.cross_entropy(outputs, labels, ignore_index=4)
            return loss_ce, (outputs, new_bs)

        (loss, (outputs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "total_loss": loss,
            "loss_ce": loss,
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
