"""Loss parity tests against independent torch-CPU oracles.

Each oracle below is written from the mathematical definition of the loss
(as documented in SURVEY §2.3), using torch only as a trusted autograd-free
numerics library — giving an implementation-independent check of the jnp
versions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wsl4mis_tpu.ops import losses
from wsl4mis_tpu.ops.gated_crf import gated_crf_loss


@pytest.fixture
def logits_labels(rng):
    logits = rng.randn(3, 16, 16, 4).astype(np.float32)
    labels = rng.randint(0, 5, (3, 16, 16)).astype(np.int32)
    return logits, labels


def _t(x):  # NHWC numpy -> NCHW torch
    if x.ndim == 4:
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    return torch.from_numpy(x.copy())


def test_cross_entropy_ignore(logits_labels):
    logits, labels = logits_labels
    ours = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 4))
    ref = F.cross_entropy(_t(logits), _t(labels).long(), ignore_index=4)
    assert abs(ours - float(ref)) < 1e-5


def test_cross_entropy_plain(logits_labels):
    logits, labels = logits_labels
    labels = np.clip(labels, 0, 3)
    ours = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(_t(logits), _t(labels).long())
    assert abs(ours - float(ref)) < 1e-5


def _dice_oracle(probs, labels, n, ignore=None):
    """Soft dice per class over whole batch, squared-sum denominator."""
    total = 0.0
    mask = np.ones_like(labels, dtype=np.float64)
    if ignore is not None:
        mask = (labels != ignore).astype(np.float64)
    for c in range(n):
        s = probs[..., c].astype(np.float64)
        t = (labels == c).astype(np.float64)
        inter = (s * t * mask).sum()
        denom = (s * s * mask).sum() + (t * t * mask).sum()
        total += 1 - (2 * inter + 1e-5) / (denom + 1e-5)
    return total / n


def test_dice_loss(rng):
    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)), -1)
    labels = rng.randint(0, 4, (2, 8, 8)).astype(np.int32)
    ours = float(losses.dice_loss(probs, jnp.asarray(labels), 4))
    ref = _dice_oracle(np.asarray(probs), labels, 4)
    assert abs(ours - ref) < 1e-5


def test_pdice_loss_ignores_class4(rng):
    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)), -1)
    labels = rng.randint(0, 5, (2, 8, 8)).astype(np.int32)
    ours = float(losses.pdice_loss(probs, jnp.asarray(labels), 4, 4))
    ref = _dice_oracle(np.asarray(probs), labels, 4, ignore=4)
    assert abs(ours - ref) < 1e-5


def test_entropy_losses(rng):
    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)), -1)
    p = np.asarray(probs).astype(np.float64)
    ent = -(p * np.log(p + 1e-6)).sum(-1)
    assert abs(float(losses.entropy_loss(probs, 4)) - (ent / np.log(4)).mean()) < 1e-6
    assert abs(float(losses.entropy_minimization(probs)) - ent.mean()) < 1e-6


def test_softmax_mse_and_kl(rng):
    a = rng.randn(2, 8, 8, 4).astype(np.float32)
    b = rng.randn(2, 8, 8, 4).astype(np.float32)
    ours_mse = np.asarray(losses.softmax_mse_loss(jnp.asarray(a), jnp.asarray(b)))
    ref_mse = (F.softmax(_t(a), 1) - F.softmax(_t(b), 1)) ** 2
    assert np.allclose(ours_mse, np.moveaxis(ref_mse.numpy(), 1, -1), atol=1e-6)

    ours_kl = float(losses.softmax_kl_loss(jnp.asarray(a), jnp.asarray(b)))
    ref_kl = F.kl_div(F.log_softmax(_t(a), 1), F.softmax(_t(b), 1), reduction="mean")
    assert abs(ours_kl - float(ref_kl)) < 1e-6


def test_tv_loss(rng):
    p = jax.nn.softmax(jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32)), -1)
    tp = _t(np.asarray(p))
    min_pool = -F.max_pool2d(-tp, (3, 3), 1, 1)
    contour = torch.relu(F.max_pool2d(min_pool, (3, 3), 1, 1) - min_pool)
    ref = float(contour.abs().mean())
    assert abs(float(losses.tv_loss(p)) - ref) < 1e-6


def test_mumford_shah(rng):
    img = rng.rand(2, 16, 16, 1).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)), -1)
    p = np.asarray(probs).astype(np.float64)
    # oracle: per image-channel level-set + prediction TV (sums)
    tgt = img[..., 0:1].astype(np.float64)
    cent = (tgt * p).sum((1, 2)) / p.sum((1, 2))
    plevel = tgt - cent[:, None, None, :]
    level = (plevel ** 2 * p).sum()
    tv = np.abs(np.diff(p, axis=1)).sum() + np.abs(np.diff(p, axis=2)).sum()
    ours = float(losses.mumford_shah_loss(jnp.asarray(img), probs))
    assert abs(ours - (level + tv)) / (abs(level + tv) + 1e-9) < 1e-5


def test_gated_crf_vs_unfold_oracle(rng):
    """Oracle: direct torch-unfold implementation of the Gated CRF formula
    (kernel = exp(-0.5 sum_c (f_nbr - f_ctr)^2) over xy/sigma_xy and
    img/sigma_rgb features, zero-padded; Potts shortcut loss)."""
    b, h, w, c = 2, 12, 12, 3
    radius = 2
    probs = jax.nn.softmax(jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1)
    img = rng.rand(b, h, w, 1).astype(np.float32)

    # torch oracle
    tp = _t(np.asarray(probs)).double()
    timg = _t(img).double()
    xs = torch.arange(w, dtype=torch.float64).view(1, 1, 1, w).expand(b, 1, h, w)
    ys = torch.arange(h, dtype=torch.float64).view(1, 1, h, 1).expand(b, 1, h, w)
    feats = torch.cat([xs / 6.0, ys / 6.0, timg / 0.1], dim=1)
    d = 2 * radius + 1

    def unfold(x):
        n, ch = x.shape[:2]
        return F.unfold(x, d, 1, radius).view(n, ch, d, d, h, w)

    fu = unfold(feats)
    diff = fu - feats.view(b, 3, 1, 1, h, w)
    kern = torch.exp(-0.5 * (diff ** 2).sum(1, keepdim=True))
    kern[:, :, radius, radius] = 0
    pu = unfold(tp)
    prod = (kern * pu).view(b, c, d * d, h, w).sum(2)
    loss_ref = (kern.sum() - (prod * tp).sum()) / (b * h * w)

    ours = float(gated_crf_loss(probs, jnp.asarray(img), radius=radius))
    assert abs(ours - float(loss_ref)) < 1e-4


def _torch_gcrf_oracle(probs, img, radius, mask_src=None, mask_dst=None,
                       compatibility=None):
    """Direct torch-unfold Gated CRF with the full reference surface
    (gate_crf_loss.py:66-121)."""
    b, h, w, c = probs.shape
    tp = _t(np.asarray(probs)).double()
    timg = _t(img).double()
    xs = torch.arange(w, dtype=torch.float64).view(1, 1, 1, w).expand(b, 1, h, w)
    ys = torch.arange(h, dtype=torch.float64).view(1, 1, h, 1).expand(b, 1, h, w)
    feats = torch.cat([xs / 6.0, ys / 6.0, timg / 0.1], dim=1)
    d = 2 * radius + 1

    def unfold(x):
        n, ch = x.shape[:2]
        return F.unfold(x, d, 1, radius).view(n, ch, d, d, h, w)

    fu = unfold(feats)
    diff = fu - feats.view(b, 3, 1, 1, h, w)
    kern = torch.exp(-0.5 * (diff ** 2).sum(1, keepdim=True))
    kern[:, :, radius, radius] = 0

    denom = b * h * w
    if mask_src is not None:
        ms = _t(mask_src).double()
        ms[ms != ms] = 0.0
        ms[ms < 1.0] = 0.0
        denom = ms.sum().clamp(min=1)
        kern = kern * unfold(ms)
    if mask_dst is not None:
        md = _t(mask_dst).double()
        md[md != md] = 0.0
        md[md < 1.0] = 0.0
        denom = md.sum().clamp(min=1)
        kern = kern * md.view(b, 1, 1, 1, h, w)

    pu = unfold(tp)
    prod = (kern * pu).view(b, c, d * d, h, w).sum(2)
    if compatibility is None:
        loss = kern.sum() - (prod * tp).sum()
    else:
        compat = torch.as_tensor(compatibility, dtype=torch.float64)
        compat = (c - 1) * F.normalize(compat, p=1, dim=1)
        y_cn = tp.permute(1, 0, 2, 3).reshape(c, -1)
        prod_nc = prod.permute(0, 2, 3, 1).reshape(-1, c)
        loss = (compat * (y_cn @ prod_nc)).sum()
    return float(loss / denom)


def test_gated_crf_masks_vs_oracle(rng):
    """mask_src/mask_dst parity (gate_crf_loss.py:66-88)."""
    b, h, w, c = 2, 12, 12, 3
    radius = 2
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1
    )
    img = rng.rand(b, h, w, 1).astype(np.float32)
    # masks with NaNs, soft values (<1), and hard 1s
    mask_src = rng.choice([0.0, 0.5, 1.0, np.nan], size=(b, h, w, 1)).astype(
        np.float32
    )
    mask_dst = rng.choice([0.0, 1.0], size=(b, h, w, 1)).astype(np.float32)

    ours_src = float(
        gated_crf_loss(probs, jnp.asarray(img), radius=radius,
                       mask_src=jnp.asarray(mask_src))
    )
    ref_src = _torch_gcrf_oracle(probs, img, radius, mask_src=mask_src)
    assert abs(ours_src - ref_src) < 1e-4

    ours_both = float(
        gated_crf_loss(probs, jnp.asarray(img), radius=radius,
                       mask_src=jnp.asarray(mask_src),
                       mask_dst=jnp.asarray(mask_dst))
    )
    ref_both = _torch_gcrf_oracle(
        probs, img, radius, mask_src=mask_src, mask_dst=mask_dst
    )
    assert abs(ours_both - ref_both) < 1e-4


def test_gated_crf_compatibility_vs_oracle(rng):
    """Non-Potts compatibility-matrix path (gate_crf_loss.py:106-118)."""
    b, h, w, c = 2, 10, 10, 3
    radius = 2
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1
    )
    img = rng.rand(b, h, w, 1).astype(np.float32)
    compat = np.array(
        [[0.0, 1.0, 2.0], [1.0, 0.0, 0.5], [2.0, 0.5, 0.0]], np.float32
    )
    ours = float(
        gated_crf_loss(probs, jnp.asarray(img), radius=radius,
                       compatibility=compat)
    )
    ref = _torch_gcrf_oracle(probs, img, radius, compatibility=compat)
    assert abs(ours - ref) / (abs(ref) + 1e-9) < 1e-4


def test_gated_crf_modality_downsampling(rng):
    """Over-resolution modality is area-pooled to prediction resolution
    (gate_crf_loss.py:126-131); a custom downsampler overrides it."""
    b, h, w, c = 1, 8, 8, 2
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1
    )
    img_hi = rng.rand(b, 2 * h, 2 * w, 1).astype(np.float32)
    img_area = np.asarray(
        torch.nn.functional.adaptive_avg_pool2d(_t(img_hi), (h, w))
    ).transpose(0, 2, 3, 1)
    ours_hi = float(gated_crf_loss(probs, jnp.asarray(img_hi), radius=2))
    ours_lo = float(gated_crf_loss(probs, jnp.asarray(img_area), radius=2))
    assert abs(ours_hi - ours_lo) < 1e-6

    def take_topleft(x, hw):
        fh = x.shape[1] // hw[0]
        fw = x.shape[2] // hw[1]
        return x[:, ::fh, ::fw, :]

    ours_custom = float(
        gated_crf_loss(
            probs, jnp.asarray(img_hi), radius=2,
            custom_modality_downsamplers={"rgb": take_topleft},
        )
    )
    ours_strided = float(
        gated_crf_loss(probs, jnp.asarray(img_hi[:, ::2, ::2, :]), radius=2)
    )
    assert abs(ours_custom - ours_strided) < 1e-6


def test_intensity_variance(rng):
    from wsl4mis_tpu.engine.methods.pce_regularized import (
        _inter_class_variance,
        _intra_class_variance,
    )

    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)), -1)
    img = jnp.asarray(rng.rand(2, 8, 8, 1).astype(np.float32))
    tp, ti = _t(np.asarray(probs)), _t(np.asarray(img))
    prod = ti * tp
    ref_intra = float(torch.std(prod, dim=[2, 3]).mean())
    ref_inter = float(torch.std(torch.mean(prod, dim=[2, 3]), dim=1).mean())
    assert abs(float(_intra_class_variance(probs, img)) - ref_intra) < 1e-5
    assert abs(float(_inter_class_variance(probs, img)) - ref_inter) < 1e-5


def test_focal_and_size_losses_finite(rng):
    logits = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (2, 8, 8)).astype(np.int32))
    assert np.isfinite(float(losses.focal_loss(logits, labels)))
    assert np.isfinite(float(losses.size_loss(logits, labels)))


def test_supcon_loss_matches_simclr_degenerate(rng):
    feats = rng.randn(4, 2, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    val = float(losses.supcon_loss(jnp.asarray(feats)))
    assert np.isfinite(val) and val > 0
