"""Gated CRF loss (Obukhov et al. 2019) — fused XLA implementation.

Semantics parity with /root/reference/code/utils/gate_crf_loss.py:5-124:
for each pixel p and neighborhood offset o within an 11x11 (radius-5) box,

    k(p, o)   = sum_d w_d * exp(-0.5 * ||f_d(p+o) - f_d(p)||^2)
    loss      = sum k - sum_o sum_c k(p,o) * y_c(p+o) * y_c(p)
    result    = loss / (N * H * W)

with features f = [xy/sigma_xy, image/sigma_rgb], zero-padded outside the
image (matching torch F.unfold semantics: border kernels see zero features
and zero probabilities), and the center offset excluded.

Instead of materializing the (N, C, 121, H, W) unfold tensor (~1.9 GB for
the reference batch), we scan over the 120 non-center offsets with
dynamic slices of a zero-padded feature/probability map — O(N*H*W) live
memory, and XLA fuses the per-offset elementwise chain. A Pallas TPU kernel
for the same contraction lives in ops/pallas/gated_crf_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_KERNELS_DESC = ({"weight": 1.0, "xy": 6.0, "rgb": 0.1},)


def _features(image, desc, h, w):
    """Stack per-modality features scaled by 1/sigma. image: (B,H,W,Ci)."""
    b = image.shape[0]
    feats = []
    for modality, sigma in desc.items():
        if modality == "weight":
            continue
        if modality == "xy":
            # gate_crf_loss.py:175-181 — x (column) mesh then y (row) mesh.
            xx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 2)
            yy = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 1)
            feats.append(xx / sigma)
            feats.append(yy / sigma)
        else:
            feats.append(image.astype(jnp.float32) / sigma)
    return jnp.concatenate(feats, axis=-1)


def gated_crf_loss(
    probs,
    image,
    kernels_desc=DEFAULT_KERNELS_DESC,
    radius: int = 5,
):
    """probs: (B, H, W, C) softmax probabilities; image: (B, H, W, Ci).

    Returns the scalar loss (reference's out['loss']).
    """
    b, h, w, c = probs.shape
    r = radius
    probs = probs.astype(jnp.float32)

    feats = [
        (float(d["weight"]), _features(image, d, h, w)) for d in kernels_desc
    ]
    fpads = [
        (wgt, jnp.pad(f, ((0, 0), (r, r), (r, r), (0, 0))))
        for wgt, f in feats
    ]
    ppad = jnp.pad(probs, ((0, 0), (r, r), (r, r), (0, 0)))

    offsets = jnp.asarray(
        [
            (dy, dx)
            for dy in range(2 * r + 1)
            for dx in range(2 * r + 1)
            if not (dy == r and dx == r)
        ],
        dtype=jnp.int32,
    )

    def step(carry, off):
        prod_acc, ksum = carry
        dy, dx = off[0], off[1]
        kernel = jnp.zeros((b, h, w), jnp.float32)
        for (wgt, fpad), (_, f) in zip(fpads, feats):
            fshift = jax.lax.dynamic_slice(
                fpad, (0, dy, dx, 0), (b, h, w, fpad.shape[-1])
            )
            diff = fshift - f
            kernel = kernel + wgt * jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1))
        pshift = jax.lax.dynamic_slice(ppad, (0, dy, dx, 0), (b, h, w, c))
        prod_acc = prod_acc + kernel[..., None] * pshift
        ksum = ksum + jnp.sum(kernel)
        return (prod_acc, ksum), None

    init = (jnp.zeros((b, h, w, c), jnp.float32), jnp.float32(0.0))
    (prod, ksum), _ = jax.lax.scan(step, init, offsets)

    loss = ksum - jnp.sum(prod * probs)
    denom = b * h * w
    return loss / denom


def select_gated_crf(prefer_pallas: str = "auto"):
    """Pick the GatedCRF implementation: the Pallas TPU kernel when running
    on TPU (prefer_pallas='auto'|'always'), else the fused-scan XLA
    version. Both are numerically interchangeable (tested)."""
    if prefer_pallas == "never":
        return gated_crf_loss
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probe
        on_tpu = False
    if prefer_pallas == "always" or (prefer_pallas == "auto" and on_tpu):
        from .pallas.gated_crf_pallas import gated_crf_loss_pallas

        return lambda probs, image: gated_crf_loss_pallas(probs, image)
    return gated_crf_loss
