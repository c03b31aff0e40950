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
