#!/usr/bin/env python
"""Trained-state oracle for the ScribbleVC class-representation memory.

VERDICT r3 item 3: `proto_acc_tran` is 0.0 wall-to-wall in training — the
trans-head prototype never classifies as its own class, so the token-memory
is-class-max gate (scribbleVC_ACDC.py:712-736) never validates. This script
answers the open question: is that a bug in OUR update, or is the
reference's math itself degenerate on trained features?

Protocol:
  1. Load a trained checkpoint (latest_full.ckpt or an inference .pth).
  2. Replay N real training batches through the flax model, capturing the
     exact pre-injection (features, normed tokens, conv/trans logits)
     quadruple the memory consumes (`memory_inputs` sow).
  3. Evolve the memory recurrence over those N steps through BOTH
     a) the flax `class_memory_update` and
     b) a line-by-line torch reimplementation of
        scribbleVC_ACDC.py:674-739 (same math as
        tests/test_scribblevc_memory_oracle.py) with the REAL trained
        classification-head weights,
     starting from the checkpoint's stored memory.
  4. Report per-side conv/trans gate pass rates, per-class pass counts,
     the argmax histogram of the gate's classifier, and bitwise gate
     agreement between the two sides.

If the torch (reference-math) side also passes the trans gate ~never, the
dead trans memory is a property of the reference's own update rule on this
data — documented root cause, not an implementation gap.

Run (CPU fine, ~2 min):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python \
    scripts/oracle_scribblevc_memory.py --checkpoint \
    model/ACDC_ScribbleVC_MAAGfold/scribble/latest_full.ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.acdc import AcdcSliceDataset
from wsl4mis_tpu.models.scribblevc import ScribbleVC, class_memory_update
from wsl4mis_tpu.utils.checkpoint import load_checkpoint

parser = argparse.ArgumentParser()
parser.add_argument(
    "--checkpoint", type=str,
    default="model/ACDC_ScribbleVC_MAAGfold/scribble/latest_full.ckpt",
)
parser.add_argument("--root_path", type=str, default=None)
parser.add_argument("--fold", type=str, default="MAAGfold")
parser.add_argument("--sup_type", type=str, default="scribble")
parser.add_argument("--batch_size", type=int, default=6)
parser.add_argument("--steps", type=int, default=40)
parser.add_argument("--num_classes", type=int, default=4)
parser.add_argument("--compute_dtype", type=str, default="bfloat16")
parser.add_argument("--hist_weight", type=float, default=0.5)
parser.add_argument("--out", type=str, default="model/r4_memory_oracle.json")
parser.add_argument(
    "--fresh_memory", action="store_true",
    help="start the recurrence from zeros/uninitialized instead of the "
    "checkpoint's stored memory (probes the warm-up phase)",
)


def torch_memory_update(torch, hf, tf, conv_cls, tran_cls, hist_conv,
                        hist_tran, initialized, hw0, wc, wt_k, wt_b):
    """scribbleVC_ACDC.py:674-739 in torch with the trained heads.

    wc: (3,3,C,ncls) HWIO conv kernel (no bias, models/scribblevc.py:78);
    wt_k/(E,ncls), wt_b/(ncls,) trans head. Returns the two gate vectors
    and the updated buffers (values only — no autograd needed here).
    """
    ncls = conv_cls.shape[1]
    b = hf.shape[0]

    def conv_head(z):  # (n,h,w,c) NHWC -> (n,ncls): conv3x3 SAME + mean
        znchw = z.permute(0, 3, 1, 2)
        w = wc.permute(3, 2, 0, 1)  # HWIO -> OIHW
        out = torch.nn.functional.conv2d(znchw, w, padding=1)
        return out.mean(dim=(2, 3))

    def trans_head(z):
        return z @ wt_k + wt_b

    rep = torch.einsum("bi,bhwc->ihwc", conv_cls, hf) / b
    ema = hw0 * hist_conv + (1 - hw0) * rep if initialized else rep
    rep_prob = conv_head(ema)
    is_max = torch.eq(torch.argmax(rep_prob, dim=1), torch.arange(ncls)).float()
    rep_m = torch.einsum("b,bhwc->bhwc", is_max, rep)
    w_vec = torch.where(is_max == 0, torch.tensor(1.0), torch.tensor(hw0))
    if initialized:
        new_hist = (
            torch.einsum("b,bhwc->bhwc", w_vec, hist_conv)
            + torch.einsum("b,bhwc->bhwc", 1 - w_vec, rep_m)
        )
    else:
        new_hist = rep_m

    trep = torch.einsum("bi,bjk->ijk", tran_cls, tf) / b
    tema = hw0 * hist_tran + (1 - hw0) * trep if initialized else trep
    trep_prob = trans_head(tema[:, 0])
    t_is_max = torch.eq(
        torch.argmax(trep_prob, dim=1), torch.arange(ncls)
    ).float()
    trep_m = torch.einsum("b,bjk->bjk", t_is_max, trep)
    t_w = torch.where(t_is_max == 0, torch.tensor(1.0), torch.tensor(hw0))
    if initialized:
        new_t_hist = (
            torch.einsum("b,bjk->bjk", t_w, hist_tran)
            + torch.einsum("b,bjk->bjk", 1 - t_w, trep_m)
        )
    else:
        new_t_hist = trep_m
    return is_max, t_is_max, new_hist, new_t_hist, rep_prob, trep_prob


def main():
    args = parser.parse_args()
    import torch

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        args.compute_dtype
    ]
    ncls = args.num_classes - 1

    restored = load_checkpoint(args.checkpoint)
    params = restored["params"]
    batch_stats = restored.get("batch_stats", {})
    mem = restored.get("class_memory")
    if mem is None or args.fresh_memory:
        mem = None

    model = ScribbleVC(
        num_classes=args.num_classes, batch_size=args.batch_size, dtype=dtype,
        hist_weight=args.hist_weight,
    )
    ds = AcdcSliceDataset(
        base_dir=args.root_path, fold=args.fold, sup_type=args.sup_type,
        patch_size=(256, 256),
        slices_dirname="ACDC_training_slices",
    )
    n = len(ds.images)
    rng = np.random.RandomState(2022)

    # the forward declares the class_memory variables even on the no-rep
    # path; feed the stored (or zero) collection so flax can resolve them
    ckpt_mem = restored.get("class_memory")
    if ckpt_mem is None:
        init_v = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, 256, 256, 1), jnp.float32), train=False,
        )
        ckpt_mem = jax.tree.map(jnp.zeros_like, init_v["class_memory"])

    @jax.jit
    def forward(x, key):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats,
             "class_memory": ckpt_mem},
            x, train=True, use_class_rep=False,
            rngs={"dropout": key},
            mutable=["intermediates", "batch_stats"],
        )
        (hf, tf, conv_cls, tran_cls) = mut["intermediates"]["memory_inputs"][0]
        return hf, tf, conv_cls, tran_cls

    # trained head weights
    wc = np.asarray(
        params["conv_cls_conv"]["Conv_0"]["kernel"], np.float32
    )
    wt_k = np.asarray(
        params["trans_cls_head"]["Dense_0"]["kernel"], np.float32
    )
    wt_b = np.asarray(params["trans_cls_head"]["Dense_0"]["bias"], np.float32)

    def jconv_head(z):
        out = jax.lax.conv_general_dilated(
            z, jnp.asarray(wc), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.mean(out, axis=(1, 2))

    def jtrans_head(z):
        return z @ jnp.asarray(wt_k) + jnp.asarray(wt_b)

    # initial memory state for both sides
    if mem is not None:
        j_hist_c = jnp.asarray(mem["hist_conv"], jnp.float32)
        j_hist_t = jnp.asarray(mem["hist_tran"], jnp.float32)
        j_init = float(np.asarray(mem["initialized"]))
    else:
        # shapes discovered from the first captured batch below
        j_hist_c = j_hist_t = None
        j_init = 0.0
    t_hist_c = t_hist_t = None
    t_init = bool(j_init)

    stats = {
        "jax": {"conv_pass": [], "tran_pass": []},
        "torch": {"conv_pass": [], "tran_pass": []},
        "conv_gate_agree": 0, "tran_gate_agree": 0,
        "tran_argmax_hist": [0] * ncls,
        "conv_argmax_hist": [0] * ncls,
        # near-parallel-reps diagnostic: rep_i = (1/B) sum_b logits[b,i] *
        # feat[b] makes every class rep a logits-weighted mean of the SAME
        # batch features; if the per-class logits are correlated across
        # the batch the reps are scalar multiples of one tensor, the gate
        # head's argmax is the same for all classes, and at most one
        # class can ever validate. Cosine ~1 here IS the root cause.
        "tran_rep_cos": [], "conv_rep_cos": [],
    }
    per_class_t = np.zeros(ncls)
    per_class_c = np.zeros(ncls)

    def _mean_pairwise_cos(reps):
        flat = np.asarray(reps, np.float32).reshape(reps.shape[0], -1)
        norm = np.linalg.norm(flat, axis=1, keepdims=True) + 1e-12
        cos = (flat / norm) @ (flat / norm).T
        iu = np.triu_indices(flat.shape[0], 1)
        return float(np.abs(cos[iu]).mean())

    for step in range(args.steps):
        idx = rng.choice(n, args.batch_size, replace=False)
        x = jnp.asarray(ds.images[idx][..., None], jnp.float32)
        hf, tf, cc, tc = forward(x, jax.random.key(step))
        hf, tf, cc, tc = (np.asarray(v, np.float32) for v in (hf, tf, cc, tc))

        if j_hist_c is None:
            j_hist_c = jnp.zeros((ncls, *hf.shape[1:]), jnp.float32)
            j_hist_t = jnp.zeros((ncls, *tf.shape[1:]), jnp.float32)
        if t_hist_c is None:
            t_hist_c = torch.tensor(np.asarray(j_hist_c))
            t_hist_t = torch.tensor(np.asarray(j_hist_t))

        # ---- jax side (the production function, trained heads) ----
        _, _, new_hc, new_ht = class_memory_update(
            jnp.asarray(hf), jnp.asarray(tf), jnp.asarray(cc), jnp.asarray(tc),
            j_hist_c, j_hist_t, jnp.asarray(j_init), args.hist_weight,
            jconv_head, jtrans_head,
        )
        # recompute the gates exactly as the update does, for reporting
        b = hf.shape[0]
        rep = jnp.einsum("bi,bhwc->ihwc", jnp.asarray(cc), jnp.asarray(hf)) / b
        ema = jnp.where(j_init > 0, args.hist_weight * j_hist_c
                        + (1 - args.hist_weight) * rep, rep)
        j_is_max = (
            jnp.argmax(jconv_head(ema), axis=1) == jnp.arange(ncls)
        ).astype(np.float32)
        trep = jnp.einsum("bi,bjk->ijk", jnp.asarray(tc), jnp.asarray(tf)) / b
        tema = jnp.where(j_init > 0, args.hist_weight * j_hist_t
                         + (1 - args.hist_weight) * trep, trep)
        j_t_is_max = (
            jnp.argmax(jtrans_head(tema[:, 0]), axis=1) == jnp.arange(ncls)
        ).astype(np.float32)
        j_hist_c, j_hist_t, j_init = new_hc, new_ht, 1.0

        # ---- torch side (reference math, same trained heads) ----
        t_im, t_tim, t_hist_c, t_hist_t, rp, trp = torch_memory_update(
            torch, torch.tensor(hf), torch.tensor(tf), torch.tensor(cc),
            torch.tensor(tc), t_hist_c, t_hist_t, t_init, args.hist_weight,
            torch.tensor(wc), torch.tensor(wt_k), torch.tensor(wt_b),
        )
        t_init = True

        jim, jtim = np.asarray(j_is_max), np.asarray(j_t_is_max)
        tim, ttim = t_im.numpy(), t_tim.numpy()
        stats["jax"]["conv_pass"].append(float(jim.mean()))
        stats["jax"]["tran_pass"].append(float(jtim.mean()))
        stats["torch"]["conv_pass"].append(float(tim.mean()))
        stats["torch"]["tran_pass"].append(float(ttim.mean()))
        stats["conv_gate_agree"] += int((jim == tim).all())
        stats["tran_gate_agree"] += int((jtim == ttim).all())
        per_class_t += ttim
        per_class_c += tim
        for i in np.argmax(trp.numpy(), axis=1):
            stats["tran_argmax_hist"][int(i)] += 1
        for i in np.argmax(rp.numpy(), axis=1):
            stats["conv_argmax_hist"][int(i)] += 1
        stats["tran_rep_cos"].append(_mean_pairwise_cos(np.asarray(trep)))
        stats["conv_rep_cos"].append(_mean_pairwise_cos(np.asarray(rep)))

    report = {
        "checkpoint": args.checkpoint,
        "steps": args.steps,
        "start_state": "fresh" if mem is None else "checkpoint",
        "jax_conv_pass_rate": float(np.mean(stats["jax"]["conv_pass"])),
        "jax_tran_pass_rate": float(np.mean(stats["jax"]["tran_pass"])),
        "torch_conv_pass_rate": float(np.mean(stats["torch"]["conv_pass"])),
        "torch_tran_pass_rate": float(np.mean(stats["torch"]["tran_pass"])),
        "conv_gate_agree_frac": stats["conv_gate_agree"] / args.steps,
        "tran_gate_agree_frac": stats["tran_gate_agree"] / args.steps,
        "torch_tran_pass_per_class": (per_class_t / args.steps).tolist(),
        "torch_conv_pass_per_class": (per_class_c / args.steps).tolist(),
        "tran_gate_argmax_hist": stats["tran_argmax_hist"],
        "conv_gate_argmax_hist": stats["conv_argmax_hist"],
        "tran_rep_mean_abs_cos": float(np.mean(stats["tran_rep_cos"])),
        "conv_rep_mean_abs_cos": float(np.mean(stats["conv_rep_cos"])),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
