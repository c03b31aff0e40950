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
