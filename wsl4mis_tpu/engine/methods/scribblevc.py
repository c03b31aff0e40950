"""ScribbleVC training driver (ACDC and MSCMR).

Rebuilds /root/reference/code/train_ACDC_scribblevc.py:120-320:
  * AdamW(lr 5e-4, wd 5e-4, eps 1e-8), constant LR (no decay by default);
  * per step: dual-head pCE (ignore 4) + 0.1 * confidence-gated mixed
    pseudo-label partial Dice (pixels where min(p1,p2) > 0.5 keep their
    beta-mixed argmax, else background) + 0.1 * GatedCRF on the beta-mixed
    ensemble + 0.1 * BCE multi-label class-presence loss averaged over the
    two classification heads;
  * the class-representation memory activates after epoch 4 (ep > 4,
    scribbleVC_ACDC.py:670) — implemented as a traced 0/1 gate on the
    memory injection so ONE jitted forward covers both phases (a
    lax.cond over two full applies doubles saved activations and OOMs
    HBM at bench batch sizes);
  * validation uses the CAM decision rule: argmax of
    (min(p1,p2) > 0.5) * (p1 + p2)/2 (val_2D_scribblevc.py:84-86).

The reference's per-slice class-presence table (slice_classification.xlsx,
not bundled) is derived from the dense labels: category[c] = class c+1
present in the slice (SURVEY §0.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data import AcdcSliceDataset, AcdcVolumeDataset, batch_iterator
from ...eval.val2d import VolumePredictor
from ...models.scribblevc import ScribbleVC
from ...ops import losses
from ...ops.gated_crf import select_gated_crf
from ..config import TrainConfig
from ..state import TrainState
from .common import (
    MethodBundle,
    compute_dtype,
    prep_batch,
    split_rngs,
    train_vis,
)


def cam_decision(outputs):
    """argmax((min(p1,p2) > 0.5) * 0.5*(p1+p2)) (val_2D_scribblevc.py:84-86)."""
    p1 = jax.nn.softmax(outputs[0], axis=-1)
    p2 = jax.nn.softmax(outputs[1], axis=-1)
    gated = (jnp.minimum(p1, p2) > 0.5) * (0.5 * (p1 + p2))
    return jnp.argmax(gated, axis=-1)


def mean_softmax_decision(outputs):
    """argmax(0.5*(softmax(p1)+softmax(p2))) — the offline test-time rule
    (test_ACDC_scribblevc.py:84-87)."""
    p1 = jax.nn.softmax(outputs[0], axis=-1)
    p2 = jax.nn.softmax(outputs[1], axis=-1)
    return jnp.argmax(0.5 * (p1 + p2), axis=-1)


def slice_categories(dense_labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(N, num_classes-1) bool class-presence table from dense labels."""
    return np.stack(
        [(dense_labels == c).any(axis=(1, 2)) for c in range(1, num_classes)],
        axis=1,
    ).astype(np.float32)


def _prototype_health(params, mem):
    """Per-step prototype diagnostics (VERDICT round-2 item 3b): magnitude
    stats of the class memory and the classification heads' accuracy on
    their own prototypes (prototype k should classify as class k — the
    is-class-max gate's health signal)."""
    z = mem["hist_conv"].astype(jnp.float32)  # (ncls, h', w', c)
    ncls = z.shape[0]
    kc = params["conv_cls_conv"]["Conv_0"]["kernel"].astype(jnp.float32)
    logits = jnp.mean(
        jax.lax.conv_general_dilated(
            z, kc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        axis=(1, 2),
    )  # (ncls, ncls)
    acc = jnp.mean(
        (jnp.argmax(logits, axis=1) == jnp.arange(ncls)).astype(jnp.float32)
    )
    td = params["trans_cls_head"]["Dense_0"]
    t0 = mem["hist_tran"][:, 0].astype(jnp.float32)
    tlogits = t0 @ td["kernel"].astype(jnp.float32) + td["bias"].astype(
        jnp.float32
    )
    tacc = jnp.mean(
        (jnp.argmax(tlogits, axis=1) == jnp.arange(ncls)).astype(jnp.float32)
    )
    return {
        "proto_acc_conv": acc,
        "proto_acc_tran": tacc,
        "mem_conv_absmax": jnp.max(jnp.abs(z)),
        "mem_conv_absmean": jnp.mean(jnp.abs(z)),
        "mem_tran_absmax": jnp.max(jnp.abs(mem["hist_tran"])),
    }


def make_step(cfg: TrainConfig, model: ScribbleVC, steps_per_epoch: int):
    num_classes = cfg.num_classes
    w_pse, w_crf, w_cls = 0.1, 0.1, 0.1
    ignore = 0 if cfg.sup_type == "label" else 4
    gated_crf_loss = select_gated_crf()

    def step_fn(state, batch, rng, aux=None):
        rngs = split_rngs(rng)
        x, labels = prep_batch(rngs["aug"], batch, aux)
        if aux is not None and "index" in batch:
            category = jnp.take(aux["category"], batch["index"], axis=0)
        else:
            category = batch["category"]
        beta = jax.random.uniform(rngs["method"]) + 1e-10
        ep = state.step // steps_per_epoch
        # Reference enables the class-representation memory from epoch 5
        # (train_ACDC_scribblevc.py:219 `epoch > 4`). A traced 0/1 gate on
        # the injection keeps it to ONE model forward — the previous
        # lax.cond over two full applies saved both branches' activations
        # and OOMed HBM at bench batch sizes (RESULTS round 3).
        rep_gate = (ep > 4).astype(jnp.float32)

        def loss_fn(params):
            variables = {
                "params": params,
                "batch_stats": state.batch_stats,
                "class_memory": state.extra["class_memory"],
            }
            out, mut = model.apply(
                variables, x, train=True, use_class_rep=True,
                rep_gate=rep_gate,
                rngs={"dropout": rngs["dropout"]},
                mutable=["batch_stats", "class_memory"],
            )
            (pred1, pred2, (conv_cls, tran_cls)) = out
            new_bs, new_mem = mut["batch_stats"], mut["class_memory"]
            p1 = jax.nn.softmax(pred1, axis=-1)
            p2 = jax.nn.softmax(pred2, axis=-1)
            loss_ce = 0.5 * (
                losses.cross_entropy(pred1, labels, ignore_index=ignore)
                + losses.cross_entropy(pred2, labels, ignore_index=ignore)
            )
            p1d = jax.lax.stop_gradient(p1)
            p2d = jax.lax.stop_gradient(p2)
            pseudo = jnp.argmax(
                (jnp.minimum(p1d, p2d) > 0.5) * (beta * p1d + (1 - beta) * p2d),
                axis=-1,
            )
            loss_pse = 0.5 * (
                losses.pdice_loss(p1, pseudo, num_classes, ignore)
                + losses.pdice_loss(p2, pseudo, num_classes, ignore)
            )
            ensemble = beta * p1 + (1 - beta) * p2
            loss_crf = gated_crf_loss(ensemble, x)
            loss_cls = 0.5 * (
                jnp.mean(optax.sigmoid_binary_cross_entropy(conv_cls, category))
                + jnp.mean(optax.sigmoid_binary_cross_entropy(tran_cls, category))
            )
            loss = (
                loss_ce + w_pse * loss_pse + w_crf * loss_crf + w_cls * loss_cls
            )
            return loss, (
                loss_ce, loss_pse, loss_crf, loss_cls, pred1, new_bs, new_mem
            )

        (loss, (l_ce, l_pse, l_crf, l_cls, pred1, new_bs, new_mem)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        state = state.apply_gradients(
            grads, batch_stats=new_bs, extra={"class_memory": new_mem}
        )
        return state, {
            "total_loss": loss,
            "loss_ce": l_ce,
            "loss_pseudo": l_pse,
            "loss_crf": l_crf,
            "loss_cls": l_cls,
            **_prototype_health(state.params, new_mem),
            "vis": train_vis(x, pred1, labels),
        }

    return step_fn


def build(cfg: TrainConfig) -> MethodBundle:
    rw_mode = "acdc"
    if cfg.fold == "MSCMRfold":
        fold = cfg.fold
        slices_dir, volumes_dir = "MSCMR_training_slices", "MSCMR_training_volumes"
    elif cfg.fold.startswith("prostate_"):
        # Prostate ScribbleVC variant (dataset_scribblevc.py:39-165);
        # num_classes=3, on-the-fly random-walker supervision supported
        fold = cfg.fold
        slices_dir, volumes_dir = (
            "Prostate_training_slices", "Prostate_training_volumes"
        )
        rw_mode = "prostate"
    else:
        fold = cfg.fold if cfg.fold.startswith("MAAGfold") else "MAAGfold"
        slices_dir, volumes_dir = "ACDC_training_slices", "ACDC_training_volumes"
    train = AcdcSliceDataset(
        base_dir=cfg.root_path, fold=fold, sup_type=cfg.sup_type,
        patch_size=cfg.patch_size, limit=cfg.data_limit,
        slices_dirname=slices_dir, rw_mode=rw_mode,
    )
    category = slice_categories(train.dense_labels, cfg.num_classes)
    val = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=fold,
        limit=(4 if cfg.data_limit else None),
        volumes_dirname=volumes_dir,
    )
    base_iter = batch_iterator(
        train, cfg.batch_size, seed=cfg.seed, include_index=True
    )
    if cfg.device_data:
        # stage images/labels/category in HBM; a batch is a (B,) index
        # vector and the gather + augmentation run inside the jitted step
        # (no per-step H2D image copy — critical over a tunneled chip).
        aux = {
            "images": jax.device_put(train.images),
            "labels": jax.device_put(train.labels.astype(np.uint8)),
            "category": jax.device_put(category),
        }
        data_iter = ({"index": b["index"].astype(np.int32)} for b in base_iter)
    else:
        aux = None

        def iter_with_category():
            for b in base_iter:
                b["category"] = category[b.pop("index")]
                yield b

        data_iter = iter_with_category()

    model = ScribbleVC(
        num_classes=cfg.num_classes, batch_size=cfg.batch_size,
        dtype=compute_dtype(cfg), remat=cfg.remat,
    )
    rng = jax.random.key(cfg.seed)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, *cfg.patch_size, 1), jnp.float32),
        train=False,
    )
    # AdamW(5e-4, wd 5e-4, eps 1e-8) (train_ACDC_scribblevc.py:146-147)
    tx = optax.adamw(5e-4, eps=1e-8, weight_decay=5e-4)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
        extra={"class_memory": variables["class_memory"]},
    )
    steps_per_epoch = max(len(train) // cfg.batch_size, 1)
    predictor = VolumePredictor(
        model, cfg.patch_size, decision_fn=cam_decision,
        apply_kwargs={"use_class_rep": True},
    )
    # Best-model selection follows the OFFLINE TEST rule (mean-softmax
    # ensemble, NO class-memory injection — test_ACDC_scribblevc.py:84-87):
    # the memory-injected CAM metric above is depressed ~14 pts by the
    # prototype injection and froze round-2 selection on an epoch-21 model
    # that scored 0.631 on test while epoch-100 scored 0.827 (RESULTS.md
    # round-2 diagnosis). The CAM rule stays as the logged training-val
    # metric for reference parity.
    select_predictor = VolumePredictor(
        model, cfg.patch_size, decision_fn=mean_softmax_decision,
        apply_kwargs={"use_class_rep": False},
    )

    def val_variables(state):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "class_memory": state.extra["class_memory"],
        }

    return MethodBundle(
        model=model,
        state=state,
        step_fn=make_step(cfg, model, steps_per_epoch),
        aux=aux,
        data_iter=data_iter,
        val_volumes=val,
        steps_per_epoch=steps_per_epoch,
        predictor=predictor,
        val_variables=val_variables,
        nan_val_metrics=True,
        dice_snapshot_threshold=0.85,
        select_predictor=select_predictor,
        select_variables=val_variables,
        eval_extra=("class_memory",),
        lr_schedule=lambda step: 5e-4,  # constant AdamW LR
                                        # (train_ACDC_scribblevc.py:146-147)
    )
