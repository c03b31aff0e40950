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


def _area_downsample(x, h, w):
    """adaptive_avg_pool2d parity for integer factors (gate_crf_loss.py:126-131):
    x (B, H, W, C) -> (B, h, w, C) by mean pooling. The reference asserts
    integer scale factors between input and prediction resolution."""
    b, hi, wi, ci = x.shape
    if (hi, wi) == (h, w):
        return x
    if hi % h or wi % w:
        raise ValueError(
            f"modality {hi}x{wi} is not an integer multiple of {h}x{w}"
        )
    fh, fw = hi // h, wi // w
    return x.reshape(b, h, fh, w, fw, ci).mean(axis=(2, 4))


def _downsample(x, modality, h, w, custom_modality_downsamplers):
    """gate_crf_loss.py:126-131 — custom downsampler override, else area."""
    if (
        custom_modality_downsamplers is not None
        and modality in custom_modality_downsamplers
    ):
        return custom_modality_downsamplers[modality](x, (h, w))
    return _area_downsample(x, h, w)


def _fix_mask(mask, h, w, custom_modality_downsamplers):
    """resize_fix_mask parity (gate_crf_loss.py:66-77): (B, H, W, 1) float
    mask resized to prediction resolution; NaNs and interpolation-softened
    edges (< 1.0) zeroed."""
    mask = mask.astype(jnp.float32)
    if mask.shape[1:3] != (h, w):
        mask = _downsample(mask, "mask", h, w, custom_modality_downsamplers)
    mask = jnp.nan_to_num(mask, nan=0.0)
    return jnp.where(mask < 1.0, 0.0, mask)


def _features(image, desc, h, w, custom_modality_downsamplers=None):
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
            feat = _downsample(
                image.astype(jnp.float32), modality, h, w,
                custom_modality_downsamplers,
            )
            feats.append(feat / sigma)
    return jnp.concatenate(feats, axis=-1)


def gated_crf_loss(
    probs,
    image,
    kernels_desc=DEFAULT_KERNELS_DESC,
    radius: int = 5,
    mask_src=None,
    mask_dst=None,
    compatibility=None,
    custom_modality_downsamplers=None,
):
    """probs: (B, H, W, C) softmax probabilities; image: (B, H, W, Ci).

    Full reference surface (gate_crf_loss.py:22,44-47,66-121):
      * mask_src (B, H, W, 1): gates kernel *source* (neighbor) pixels; the
        denominator becomes mask_src.sum().clamp(1).
      * mask_dst (B, H, W, 1): gates kernel *destination* (center) pixels;
        overrides the denominator with mask_dst.sum().clamp(1).
      * compatibility (C, C): non-Potts class compatibility; rows are
        L1-normalized and scaled by (C-1); the loss becomes
        sum(compat * (y^T K y)) without the kernels.sum() term.
      * custom_modality_downsamplers: {modality: fn(x, (h, w))} overriding
        the area downsampler for over-resolution modalities/masks.

    Returns the scalar loss (reference's out['loss']).
    """
    b, h, w, c = probs.shape
    r = radius
    probs = probs.astype(jnp.float32)

    feats = [
        (
            float(d["weight"]),
            _features(image, d, h, w, custom_modality_downsamplers),
        )
        for d in kernels_desc
    ]
    fpads = [
        (wgt, jnp.pad(f, ((0, 0), (r, r), (r, r), (0, 0))))
        for wgt, f in feats
    ]
    ppad = jnp.pad(probs, ((0, 0), (r, r), (r, r), (0, 0)))

    denom = jnp.float32(b * h * w)
    src_pad = None
    if mask_src is not None:
        mask_src = _fix_mask(mask_src, h, w, custom_modality_downsamplers)
        denom = jnp.clip(jnp.sum(mask_src), 1.0, None)
        src_pad = jnp.pad(mask_src[..., 0], ((0, 0), (r, r), (r, r)))
    dst = None
    if mask_dst is not None:
        mask_dst = _fix_mask(mask_dst, h, w, custom_modality_downsamplers)
        denom = jnp.clip(jnp.sum(mask_dst), 1.0, None)
        dst = mask_dst[..., 0]

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
        if src_pad is not None:
            # kernel *= unfolded source mask (neighbor pixel p+o)
            kernel = kernel * jax.lax.dynamic_slice(
                src_pad, (0, dy, dx), (b, h, w)
            )
        if dst is not None:
            kernel = kernel * dst  # destination mask (center pixel p)
        pshift = jax.lax.dynamic_slice(ppad, (0, dy, dx, 0), (b, h, w, c))
        prod_acc = prod_acc + kernel[..., None] * pshift
        ksum = ksum + jnp.sum(kernel)
        return (prod_acc, ksum), None

    init = (jnp.zeros((b, h, w, c), jnp.float32), jnp.float32(0.0))
    (prod, ksum), _ = jax.lax.scan(step, init, offsets)

    if compatibility is None:
        # Potts shortcut (gate_crf_loss.py:101-105)
        loss = ksum - jnp.sum(prod * probs)
    else:
        # (C-1) * row-L1-normalized compatibility; loss = sum(compat * y^T K y)
        # (gate_crf_loss.py:106-118) — no kernels.sum() term on this path.
        compat = jnp.asarray(compatibility, jnp.float32)
        compat = (c - 1) * compat / jnp.clip(
            jnp.sum(jnp.abs(compat), axis=1, keepdims=True), 1e-12, None
        )
        product_cc = jnp.einsum("bhwi,bhwj->ij", probs, prod)
        loss = jnp.sum(compat * product_cc)
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

        def dispatch(probs, image, kernels_desc=DEFAULT_KERNELS_DESC,
                     radius=5, **kw):
            # Masks/compatibility break the kernel-operator symmetry that
            # the Pallas analytic VJP relies on — those variants take the
            # fused-scan XLA path (autodiffed end to end).
            if any(kw.get(k) is not None for k in
                   ("mask_src", "mask_dst", "compatibility",
                    "custom_modality_downsamplers")):
                return gated_crf_loss(probs, image, kernels_desc, radius, **kw)
            return gated_crf_loss_pallas(
                probs, image, radius, kernels_desc=kernels_desc
            )

        return dispatch
    return gated_crf_loss
