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
