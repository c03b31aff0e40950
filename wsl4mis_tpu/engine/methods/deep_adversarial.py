"""Deep Adversarial Network (DAN) semi-supervised training.

Rebuilds /root/reference/code/train_deep_adversarial_network_2D.py:100-180:

  G-step: supervised 0.5*(CE+Dice) on labeled + ramped adversarial term
          CE(D(softmax(unlabeled), unlabeled_img), "labeled") with the
          discriminator in eval mode; SGD on the segmenter.
  D-step: the segmenter re-run in eval mode (no grad), discriminator
          trained with Adam(1e-4, betas (0.9, 0.99)) to classify
          labeled-vs-unlabeled predictions.

Both phases run inside one jitted step; the discriminator's params and
Adam state live in state.extra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data import AcdcSliceDataset, AcdcVolumeDataset, paired_iterator
from ...models.discriminator import FCDiscriminator
from ...ops import losses
from ..config import TrainConfig
from ..optim import reference_adam
from .common import (
    MethodBundle,
    compute_dtype,
    forward_train,
    make_model_and_state,
    prep_batch,
    resolve_labeled_bs,
    sigmoid_rampup_jnp,
    split_rngs,
    train_vis,
)


def make_step(cfg: TrainConfig, disc: FCDiscriminator, disc_tx):
    num_classes = cfg.num_classes
    # honor --labeled_bs (train_deep_adversarial_network_2D.py:58)
    labeled_bs = resolve_labeled_bs(cfg)

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(
            rng, ("aug", "dropout", "dropout2", "feature_perturb", "disc")
        )
        x, labels = prep_batch(rngs["aug"], batch)
        x_lab, y_lab = x[:labeled_bs], labels[:labeled_bs]
        x_unlab = x[labeled_bs:]
        disc_params = state.extra["disc_params"]

        # ---------------- G-step ----------------
        def gen_loss_fn(params):
            st = state.replace(params=params)
            out_lab, bs1 = forward_train(
                st, x_lab,
                {"dropout": rngs["dropout"], "feature_perturb": rngs["feature_perturb"]},
            )
            out_unlab, bs2 = forward_train(
                st.replace(batch_stats=bs1), x_unlab,
                {"dropout": rngs["dropout2"], "feature_perturb": rngs["feature_perturb"]},
            )
            probs_lab = jax.nn.softmax(out_lab, axis=-1)
            probs_unlab = jax.nn.softmax(out_unlab, axis=-1)
            loss_ce = losses.cross_entropy(out_lab, y_lab)
            loss_dice = losses.dice_loss(probs_lab, y_lab, num_classes)
            supervised = 0.5 * (loss_ce + loss_dice)
            # D in eval mode (no dropout) during the generator phase
            d_out = disc.apply(
                {"params": disc_params}, probs_unlab, x_unlab, train=False
            )
            adv_target = jnp.ones((x_unlab.shape[0],), jnp.int32)
            adversarial = losses.cross_entropy(
                d_out[:, None, None, :], adv_target[:, None, None]
            )
            weight = cfg.consistency * sigmoid_rampup_jnp(
                state.step // 150, cfg.consistency_rampup
            )
            loss = supervised + weight * adversarial
            return loss, (loss_ce, loss_dice, adversarial, bs2)

        (loss, (loss_ce, loss_dice, adversarial, new_bs)), grads = (
            jax.value_and_grad(gen_loss_fn, has_aux=True)(state.params)
        )
        state = state.apply_gradients(grads, batch_stats=new_bs)

        # ---------------- D-step ----------------
        # reference re-runs the segmenter in eval mode (running BN stats,
        # no dropout) before training the discriminator
        out_lab_eval = state.apply_fn(state.variables, x_lab, train=False)
        out_unlab_eval = state.apply_fn(state.variables, x_unlab, train=False)
        probs_all = jax.lax.stop_gradient(
            jax.nn.softmax(
                jnp.concatenate([out_lab_eval, out_unlab_eval], axis=0), axis=-1
            )
        )
        x_all = jnp.concatenate([x_lab, x_unlab], axis=0)
        d_target = jnp.concatenate(
            [
                jnp.ones((labeled_bs,), jnp.int32),
                jnp.zeros((x_unlab.shape[0],), jnp.int32),
            ]
        )

        def disc_loss_fn(dparams):
            d_out = disc.apply(
                {"params": dparams}, probs_all, x_all, train=True,
                rngs={"feature_perturb": rngs["disc"]},
            )
            return losses.cross_entropy(
                d_out[:, None, None, :], d_target[:, None, None]
            )

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_params)
        d_updates, d_opt_state = disc_tx.update(
            d_grads, state.extra["disc_opt_state"], disc_params
        )
        import optax

        new_disc_params = optax.apply_updates(disc_params, d_updates)
        state = state.replace(
            extra={"disc_params": new_disc_params, "disc_opt_state": d_opt_state}
        )
        return state, {
            "total_loss": loss,
            "loss_ce": loss_ce,
            "loss_dice": loss_dice,
            "consistency_loss": adversarial,
            "dan_loss": d_loss,
            "vis": train_vis(x_lab, out_lab_eval, y_lab),
        }

    return step_fn


def build(cfg: TrainConfig) -> MethodBundle:
    model, state = make_model_and_state(cfg)
    disc = FCDiscriminator(num_classes=cfg.num_classes, dtype=compute_dtype(cfg))
    rng = jax.random.key(cfg.seed + 1)
    dummy_map = jnp.zeros((1, *cfg.patch_size, cfg.num_classes), jnp.float32)
    dummy_img = jnp.zeros((1, *cfg.patch_size, 1), jnp.float32)
    disc_vars = disc.init(
        {"params": rng, "feature_perturb": rng}, dummy_map, dummy_img, train=False
    )
    disc_tx = reference_adam(1e-4)
    state = state.replace(
        extra={
            "disc_params": disc_vars["params"],
            "disc_opt_state": disc_tx.init(disc_vars["params"]),
        }
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
    return MethodBundle(
        model=model,
        state=state,
        step_fn=make_step(cfg, disc, disc_tx),
        data_iter=it,
        val_volumes=val,
        steps_per_epoch=len(unlabeled) // unlabeled_bs,
    )
