"""pCE + regularizer family: TV, entropy-min, GatedCRF, Mumford-Shah,
inter/intra intensity variance.

One module rebuilds five reference scripts that share the pCE skeleton and
differ only in the added regularizer:

  * pce_tv               — train_weakly_supervised_pCE_TV_2D.py:58-65,113-114
                           loss = CE + 1e-2 * tv(probs). (The reference's
                           `outputs_soft[1:]` slices the *batch* dim — a
                           quirk, SURVEY §0.5; we regularize the foreground
                           channels, the evident intent.)
  * pce_entropy_mini     — ..._Entropy_Mini_2D.py:99-102
                           loss = CE + 0.1 * entropy_loss(probs, C=4)
  * pce_gatedcrf         — ..._GatedCRFLoss_2D.py:103-123
                           loss = CE + 0.1 * GatedCRF(radius 5,
                           kernels [{w:1, xy:6, rgb:0.1}])
  * pce_mumford_shah     — ..._MumfordShah_Loss_2D.py:83,102-103
                           loss = CE + 1e-6 * MumfordShah(img, probs)
  * pce_intensity_variance — ..._Inter&Intra_Class_2D.py:30-36,105-118
                           loss = CE + w(it//150) * (inter - intra) where
                           intra/inter are torch.std-based statistics and
                           w is the sigmoid-ramped consistency weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import losses
from ...ops.gated_crf import select_gated_crf
from ..config import TrainConfig
from .common import (
    MethodBundle,
    stage_dataset,
    forward_train,
    make_model_and_state,
    prep_batch,
    sigmoid_rampup_jnp,
    split_rngs,
    standard_data,
    train_vis,
)


def _torch_std(x, axis):
    """torch.std default: unbiased (ddof=1)."""
    return jnp.sqrt(jnp.var(x, axis=axis, ddof=1))


def _intra_class_variance(probs, img):
    # train_..._Inter&Intra_Class_2D.py:30-32 — std over spatial dims of
    # img*prob per (batch, class), then mean.
    prod = img * probs  # (B,H,W,C)
    return jnp.mean(_torch_std(prod.reshape(prod.shape[0], -1, prod.shape[-1]), 1))


def _inter_class_variance(probs, img):
    # :34-36 — spatial mean per (batch, class), std over classes, mean.
    prod = img * probs
    means = jnp.mean(prod, axis=(1, 2))  # (B, C)
    return jnp.mean(_torch_std(means, 1))


def make_step(cfg: TrainConfig):
    method = cfg.method
    num_classes = cfg.num_classes
    gated_crf_loss = select_gated_crf()

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
            probs = jax.nn.softmax(outputs, axis=-1)
            loss_ce = losses.cross_entropy(outputs, labels, ignore_index=4)
            if method == "pce_tv":
                reg = losses.tv_loss(probs[..., 1:])
                loss = loss_ce + 1e-2 * reg
            elif method == "pce_entropy_mini":
                reg = losses.entropy_loss(probs, num_classes)
                loss = loss_ce + 0.1 * reg
            elif method == "pce_gatedcrf":
                reg = gated_crf_loss(probs, x)
                loss = loss_ce + 0.1 * reg
            elif method == "pce_mumford_shah":
                reg = losses.mumford_shah_loss(x, probs)
                loss = loss_ce + 1e-6 * reg
            elif method == "pce_intensity_variance":
                inter = _inter_class_variance(probs, x)
                intra = _intra_class_variance(probs, x)
                reg = inter - intra
                weight = cfg.consistency * sigmoid_rampup_jnp(
                    state.step // 150, cfg.consistency_rampup
                )
                loss = loss_ce + weight * reg
            else:
                raise ValueError(f"unhandled method {method}")
            return loss, (loss_ce, reg, outputs, new_bs)

        (loss, (loss_ce, reg, outputs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_reg": reg,
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
