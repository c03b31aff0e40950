"""Parity tests for the in-VMEM banded-conv Pallas kernel (interpret mode).

Forward and both VJP paths must match lax.conv_general_dilated to float
tolerance on every (C, O) configuration the UNet uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
    banded_conv3x3_pallas,
    eligible,
    plan_banded,
)


def _ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


# (C, O, H, W): every distinct conv shape family in the UNet zoo plus
# non-square and W-not-divisible-by-J cases.
SHAPES = [
    (16, 16, 64, 64),
    (16, 32, 32, 64),
    (32, 32, 64, 64),
    (32, 16, 64, 64),
    (32, 64, 32, 32),
    (64, 64, 32, 32),
    (64, 32, 32, 32),
    (16, 16, 64, 50),   # W % J != 0 -> right-pad path
    (1, 16, 8, 256),    # stem conv (small-c admission, round 4)
    (4, 16, 8, 256),    # 4-class head's dgrad shape family
    (4, 4, 8, 300),     # small-c + W % J != 0
    (128, 64, 8, 16),   # M=2 dense plan (round 4)
    (32, 16, 8, 250),   # M=2 dense + W % J != 0 right-pad path
]


@pytest.mark.parametrize("c,o,h,w", SHAPES)
def test_forward_matches_lax_conv(c, o, h, w):
    key = jax.random.key(c * 1000 + o + h + w)
    kx, kk, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, h, w, c), jnp.float32)
    k = jax.random.normal(kk, (3, 3, c, o), jnp.float32) * 0.1
    b = jax.random.normal(kb, (o,), jnp.float32)
    assert eligible(x.shape, k.shape)
    got = banded_conv3x3_pallas(x, k, b, interpret=True)
    want = _ref_conv(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("c,o,h,w", [(16, 16, 32, 32), (32, 64, 32, 32),
                                     (16, 32, 32, 32), (64, 32, 32, 32),
                                     (1, 16, 8, 256), (4, 16, 8, 256)])
def test_grads_match_lax_conv(c, o, h, w):
    key = jax.random.key(7)
    kx, kk, kb, kg = jax.random.split(key, 4)
    x = jax.random.normal(kx, (2, h, w, c), jnp.float32)
    k = jax.random.normal(kk, (3, 3, c, o), jnp.float32) * 0.1
    b = jax.random.normal(kb, (o,), jnp.float32)
    ct = jax.random.normal(kg, (2, h, w, o), jnp.float32)

    def loss_banded(x, k, b):
        return jnp.sum(banded_conv3x3_pallas(x, k, b, interpret=True) * ct)

    def loss_ref(x, k, b):
        return jnp.sum(_ref_conv(x, k, b) * ct)

    gx1, gk1, gb1 = jax.grad(loss_banded, argnums=(0, 1, 2))(x, k, b)
    gx2, gk2, gb2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-3, rtol=1e-4)


def test_plan_rejects_losing_and_odd_shapes():
    # C=O=128: direct lowering is already lane-dense -> no win
    assert plan_banded(128, 128, 32, 32) is None
    # tiny channel counts are admitted since round 4 (the W-minor relayout
    # family fix); WSL4MIS_BANDED_SMALLC=0 restores the old rejection
    assert plan_banded(4, 16, 64, 64) is not None
    import os

    os.environ["WSL4MIS_BANDED_SMALLC"] = "0"
    plan_banded.cache_clear()
    try:
        assert plan_banded(4, 16, 64, 64) is None
        assert plan_banded(1, 16, 8, 256) is None
    finally:
        del os.environ["WSL4MIS_BANDED_SMALLC"]
        plan_banded.cache_clear()
    # non-multiple-of-128 channel count -> rejected
    assert plan_banded(3, 16, 64, 64) is None
    # H that does not block -> rejected
    assert plan_banded(16, 16, 63, 64) is None
    # (128, 64): the M=1 (J*C==128) plan only ties the direct lowering,
    # but the round-4 dense M=2 plan amortizes the halo and wins
    p = plan_banded(128, 64, 16, 16)
    assert p is not None and p.m == 2 and p.j * p.o == 128
    # the workhorse shapes must be eligible with near-dense tiles
    p = plan_banded(16, 16, 256, 256)
    assert p is not None and p.j == 8 and p.cost_per_pixel <= 17000
    assert plan_banded(32, 64, 64, 64) is not None


def test_bfloat16_forward_close():
    key = jax.random.key(3)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (2, 32, 32, 16), jnp.bfloat16)
    k = (jax.random.normal(kk, (3, 3, 16, 16), jnp.float32) * 0.1).astype(
        jnp.bfloat16
    )
    b = jnp.zeros((16,), jnp.bfloat16)
    got = banded_conv3x3_pallas(x, k, b, interpret=True).astype(jnp.float32)
    want = _ref_conv(x.astype(jnp.float32), k.astype(jnp.float32),
                     b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.15, rtol=0.1)
