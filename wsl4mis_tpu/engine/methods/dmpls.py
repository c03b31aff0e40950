"""DMPLS — Dynamically Mixed Pseudo-Label Supervision (MICCAI'22).

Rebuilds /root/reference/code/train_weakly_supervised_segmentation_pCE_
ours_proposed.py:73-158: dual-branch UNet_CCT; pCE on both heads; a random
beta ~ U(0,1) mixes the two detached softmaxes, whose argmax supervises
both branches through a partial Dice loss:

    loss_ce  = 0.5 * (CE4(main) + CE4(aux))
    pseudo   = argmax(beta * p1.sg + (1-beta) * p2.sg)
    loss_pse = 0.5 * (pDice(p1, pseudo) + pDice(p2, pseudo))
    loss     = loss_ce + 0.5 * loss_pse

The per-step beta becomes an explicit PRNG draw inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    num_classes = cfg.num_classes

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(rng)
        x, labels = prep_batch(
            rngs["aug"], batch, aux, augment=cfg.aug_mode != "host"
        )
        beta = jax.random.uniform(rngs["method"]) + 1e-10

        def loss_fn(params):
            (out_main, out_aux), new_bs = forward_train(
                state.replace(params=params),
                x,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            p1 = jax.nn.softmax(out_main, axis=-1)
            p2 = jax.nn.softmax(out_aux, axis=-1)
            loss_ce = 0.5 * (
                losses.cross_entropy(out_main, labels, ignore_index=4)
                + losses.cross_entropy(out_aux, labels, ignore_index=4)
            )
            mixed = beta * jax.lax.stop_gradient(p1) + (1.0 - beta) * jax.lax.stop_gradient(p2)
            pseudo = jnp.argmax(mixed, axis=-1)
            loss_pse = 0.5 * (
                losses.pdice_loss(p1, pseudo, num_classes)
                + losses.pdice_loss(p2, pseudo, num_classes)
            )
            loss = loss_ce + 0.5 * loss_pse
            return loss, (loss_ce, loss_pse, out_main, new_bs)

        (loss, (loss_ce, loss_pse, out_main, new_bs)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_pse_sup": loss_pse,
            "vis": train_vis(x, out_main, labels),
        }

    return step_fn


def build(cfg: TrainConfig) -> MethodBundle:
    model, state = make_model_and_state(cfg, model_name="unet_cct")
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
