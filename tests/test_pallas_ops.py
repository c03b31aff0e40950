"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.ops.gated_crf import gated_crf_loss
from wsl4mis_tpu.ops.pallas.gated_crf_pallas import gated_crf_loss_pallas


@pytest.mark.slow
def test_gated_crf_pallas_matches_scan(rng):
    b, h, w, c = 2, 24, 24, 4
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1
    )
    img = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    ref = float(gated_crf_loss(probs, img, radius=3))
    got = float(gated_crf_loss_pallas(probs, img, 3, True))
    assert abs(ref - got) < 1e-5

    g_ref = jax.grad(lambda p: gated_crf_loss(p, img, radius=3))(probs)
    g_pal = jax.grad(lambda p: gated_crf_loss_pallas(p, img, 3, True))(probs)
    assert float(jnp.abs(g_ref - g_pal).max()) < 1e-7


@pytest.mark.slow
def test_gated_crf_pallas_multi_kernel_desc(rng):
    """Pallas == XLA for a 2-descriptor composition (RGBXY + XY,
    gate_crf_loss.py:27-38 example), value and gradient."""
    b, h, w, c = 2, 16, 16, 4
    desc = [
        {"weight": 0.9, "xy": 6.0, "rgb": 0.1},
        {"weight": 0.1, "xy": 6.0},
    ]
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)), -1
    )
    img = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    ref = float(gated_crf_loss(probs, img, kernels_desc=desc, radius=3))
    got = float(gated_crf_loss_pallas(probs, img, 3, True, kernels_desc=desc))
    assert abs(ref - got) < 1e-5

    g_ref = jax.grad(
        lambda p: gated_crf_loss(p, img, kernels_desc=desc, radius=3)
    )(probs)
    g_pal = jax.grad(
        lambda p: gated_crf_loss_pallas(p, img, 3, True, kernels_desc=desc)
    )(probs)
    assert float(jnp.abs(g_ref - g_pal).max()) < 1e-7


def test_augment_pallas_matches_xla_policy(rng):
    """Same PRNG key selects the same transform in the Pallas kernel and the
    XLA augment_batch; rot90/flip and identity branches are bit-exact, the
    rotate branch is the 3-shear variant (same angle, high agreement)."""
    from wsl4mis_tpu.data.augment_device import augment_batch
    from wsl4mis_tpu.ops.pallas.augment_pallas import augment_batch_pallas

    B, H, W = 16, 64, 64
    imgs = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    labs = jnp.asarray(rng.randint(0, 5, (B, H, W)).astype(np.int32))
    key = jax.random.key(3)
    pi, plb = augment_batch_pallas(key, imgs, labs, interpret=True)
    xi, xlb = augment_batch(key, imgs, labs)
    img_same = np.asarray((pi == xi).mean(axis=(1, 2)))
    lab_same = np.asarray((plb == xlb).mean(axis=(1, 2)))
    # every sample either bit-exact (identity / rot90+flip branches) or a
    # rotate with >= 55% identical pixels (random noise; natural images are
    # far higher since disagreements are 1-pixel neighbors)
    assert ((img_same == 1.0) | (img_same > 0.55)).all(), img_same
    assert ((lab_same == 1.0) | (lab_same > 0.55)).all(), lab_same
    assert (img_same == 1.0).any() and (img_same < 1.0).any()
    # label values stay in the legal set
    assert set(np.unique(np.asarray(plb))) <= set(range(5))


def test_augment_pallas_rotate_matches_reference(rng):
    """Kernel 3-shear rotate == numpy reference, and the staggered x-shear
    keeps high agreement with the exact nearest map at small angles."""
    from wsl4mis_tpu.data.augment_device import _rotate_nearest
    from wsl4mis_tpu.ops.pallas.augment_pallas import (
        _rotate3, rotate_shear3_reference, shear_offsets)

    H = W = 96
    img = rng.rand(H, W).astype(np.float32)
    for ang in (-20, -3, 1, 7, 19):
        ref = rotate_shear3_reference(img, ang, 0.0)
        o1, o2, o3 = shear_offsets(jnp.int32(ang), H, W)
        ker = np.asarray(
            _rotate3(jnp.asarray(img), o1, o2, o3, jnp.float32(0), H, W)
        )
        assert np.array_equal(ker, ref), f"angle {ang}"
        exact = np.asarray(_rotate_nearest(jnp.asarray(img), jnp.int32(ang), 0.0))
        assert (ref == exact).mean() > 0.6, f"angle {ang}"
