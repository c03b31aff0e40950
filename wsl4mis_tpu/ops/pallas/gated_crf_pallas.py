"""Pallas TPU kernel for the Gated CRF loss contraction.

The Gated CRF loss (ops/gated_crf.py; reference gate_crf_loss.py:163-188)
is dominated by the neighborhood contraction

    prod_c(x) = sum_off k(x, off) * p_c(x + off)
    ksum      = sum_{x, off} k(x, off)
    k(x, off) = w * exp(-0.5 * ||f(x+off) - f(x)||^2),   center off = 0

over the 120 non-center offsets of an 11x11 window. A torch unfold
materializes N*C*121*H*W floats (~1.9 GB at the reference batch); here one
Pallas program per batch element holds the zero-padded feature (3, H+2r,
W+2r) and probability (C, H+2r, W+2r) planes in VMEM (~2 MB) and loops the
offsets with dynamic slices — the kernel Gaussian is recomputed in
registers, nothing round-trips to HBM.

The backward pass is analytic: the loss is ksum - p^T A p with A the
(symmetric on in-image pairs) kernel operator, so grad_p = -2 * prod / D.
Implemented as a jax.custom_vjp that reuses the forward kernel's `prod`.

Channel-planes-first layout (C, H, W) keeps the last two dims on the
(sublane, lane) tiling; channel loops are tiny static unrolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gated_crf import DEFAULT_KERNELS_DESC, _features


def _gcrf_kernel(fpad_ref, ppad_ref, prod_ref, ksum_ref, *, radius, h, w,
                 nf_splits, nc, weights):
    d = 2 * radius + 1

    # Mosaic needs statically-analyzable sublane/lane offsets, so the
    # offset loop is a static unroll of (2r+1)^2 - 1 shifted windows.
    # Accumulation goes through the output refs (not SSA values) so the
    # live set per unrolled step stays at a couple of (h, w) planes —
    # value accumulators made the scoped-VMEM stack explode.
    # The kernel composition is a static unroll over the descriptor list:
    # k = sum_d w_d * exp(-0.5 * ||f_d(p+o) - f_d(p)||^2), each descriptor's
    # feature planes occupying a contiguous slice of the stacked features.
    prod_ref[...] = jnp.zeros_like(prod_ref)
    ksum_ref[0, 0, 0] = 0.0
    for dy in range(d):
        for dx in range(d):
            if dy == radius and dx == radius:
                continue
            kern = jnp.zeros((h, w), jnp.float32)
            base = 0
            for wgt, nf in zip(weights, nf_splits):
                sq = jnp.zeros((h, w), jnp.float32)
                for c in range(base, base + nf):
                    diff = (
                        fpad_ref[0, c, dy:dy + h, dx:dx + w]
                        - fpad_ref[0, c, radius:radius + h, radius:radius + w]
                    )
                    sq += diff * diff
                kern += wgt * jnp.exp(-0.5 * sq)
                base += nf
            for c in range(nc):
                prod_ref[0, c] += kern * ppad_ref[0, c, dy:dy + h, dx:dx + w]
            ksum_ref[0, 0, 0] += jnp.sum(kern)


def _gcrf_products(probs_chw, feats_chw, radius: int, weights, nf_splits,
                   interpret: bool = False):
    """probs_chw: (B, C, H, W); feats_chw: (B, sum(nf), H, W) — returns
    (prod (B, C, H, W), ksum (B, 1, 1))."""
    b, nc, h, w = probs_chw.shape
    nf = feats_chw.shape[1]
    r = radius
    fpad = jnp.pad(feats_chw, ((0, 0), (0, 0), (r, r), (r, r)))
    ppad = jnp.pad(probs_chw, ((0, 0), (0, 0), (r, r), (r, r)))

    kernel = functools.partial(
        _gcrf_kernel, radius=r, h=h, w=w, nf_splits=tuple(nf_splits), nc=nc,
        weights=tuple(weights),
    )
    prod, ksum = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nf, h + 2 * r, w + 2 * r),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nc, h + 2 * r, w + 2 * r),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nc, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(fpad, ppad)
    return prod, ksum


def gated_crf_loss_pallas(probs, image, radius: int = 5,
                          interpret: bool = False,
                          kernels_desc=DEFAULT_KERNELS_DESC):
    """Drop-in replacement for ops.gated_crf.gated_crf_loss for arbitrary
    kernel descriptor lists (gate_crf_loss.py:27-38): each descriptor
    contributes w_d * exp(-0.5 ||Δf_d||²) to the composite kernel, unrolled
    statically inside the Pallas program. mask/compatibility variants route
    to the XLA implementation (select_gated_crf) — their kernel operator is
    no longer symmetric, which this kernel's analytic VJP exploits.

    probs: (B, H, W, C) softmax; image: (B, H, W, Ci).
    """
    desc_key = tuple(
        tuple(sorted((k, float(v)) for k, v in d.items()))
        for d in kernels_desc
    )
    return _gated_crf_pallas(probs, image, radius, interpret, desc_key)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gated_crf_pallas(probs, image, radius, interpret, desc_key):
    loss, _ = _fwd(probs, image, radius, interpret, desc_key)
    return loss


def _loss_from_products(probs_chw, prod, ksum):
    b, _, h, w = probs_chw.shape
    return (jnp.sum(ksum) - jnp.sum(prod * probs_chw)) / (b * h * w)


def _fwd(probs, image, radius, interpret, desc_key):
    descs = [dict(items) for items in desc_key]
    b, h, w, _ = probs.shape
    weights, nf_splits, feat_stacks = [], [], []
    for desc in descs:
        f = _features(image, desc, h, w)
        weights.append(float(desc["weight"]))
        nf_splits.append(f.shape[-1])
        feat_stacks.append(f)
    feats = jnp.concatenate(feat_stacks, axis=-1)
    probs_chw = jnp.transpose(probs.astype(jnp.float32), (0, 3, 1, 2))
    feats_chw = jnp.transpose(feats, (0, 3, 1, 2))
    prod, ksum = _gcrf_products(probs_chw, feats_chw, radius, weights,
                                nf_splits, interpret)
    loss = _loss_from_products(probs_chw, prod, ksum)
    return loss, (prod, b, h, w)


def _bwd(radius, interpret, desc_key, res, g):
    prod, b, h, w = res
    grad_chw = (-2.0 * g / (b * h * w)) * prod
    grad_probs = jnp.transpose(grad_chw, (0, 2, 3, 1))
    return grad_probs, None


_gated_crf_pallas.defvjp(_fwd, _bwd)
