"""Bit-parity of the fused 2x2 max pool against flax's reduce-window
path — forward and gradient, including the tie-routing (select-and-
scatter scatters to the FIRST max in row-major window order, and
post-ReLU maps tie at 0.0 constantly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from wsl4mis_tpu.ops.maxpool import max_pool_2x2, max_pool_2x2_v2

POOLS = [max_pool_2x2, max_pool_2x2_v2]


def _ref_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("pool", POOLS)
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (3, 16, 12, 5)])
def test_forward_bit_equal(pool, shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    np.testing.assert_array_equal(pool(x), _ref_pool(x))


@pytest.mark.parametrize("fused", POOLS)
@pytest.mark.parametrize("quantize", [False, True])
def test_grad_bit_equal(fused, quantize):
    x = jax.random.normal(jax.random.key(1), (2, 12, 16, 4), jnp.float32)
    if quantize:
        # Heavy ties (incl. whole windows of equal values), the post-ReLU
        # regime where first-max routing actually matters.
        x = jnp.round(x)
        x = jnp.maximum(x, 0.0)
    g = jax.random.normal(jax.random.key(2), (2, 6, 8, 4), jnp.float32)

    def loss(pool, xx):
        return jnp.vdot(pool(xx), g)

    dx_fused = jax.grad(lambda xx: loss(fused, xx))(x)
    dx_ref = jax.grad(lambda xx: loss(_ref_pool, xx))(x)
    np.testing.assert_array_equal(dx_fused, dx_ref)


@pytest.mark.parametrize("pool", POOLS)
def test_grad_all_tied_window(pool):
    """A fully-tied window must send the whole cotangent to tap (0,0)."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    dx = jax.grad(lambda xx: jnp.sum(pool(xx)))(x)
    expect = np.zeros((1, 2, 2, 1), np.float32)
    expect[0, 0, 0, 0] = 1.0
    np.testing.assert_array_equal(dx, expect)
    dx_ref = jax.grad(lambda xx: jnp.sum(_ref_pool(xx)))(x)
    np.testing.assert_array_equal(dx_ref, expect)


@pytest.mark.parametrize("pool", POOLS)
def test_bf16_forward(pool):
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 4)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(pool(x), np.float32),
        np.asarray(_ref_pool(x), np.float32),
    )


# ---- v3 (selection-matmul pool) — UNet-real shapes only ----------------

from wsl4mis_tpu.ops.maxpool import _v3_applicable, max_pool_2x2_v3  # noqa: E402

V3_SHAPES = [
    (2, 16, 16, 16), (2, 8, 8, 32), (1, 8, 8, 64), (2, 4, 4, 128),
    (1, 8, 16, 16), (2, 4, 8, 256),
]


@pytest.mark.parametrize("shape", V3_SHAPES)
def test_v3_forward_bit_equal(shape):
    assert _v3_applicable(shape)
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    np.testing.assert_array_equal(max_pool_2x2_v3(x), _ref_pool(x))


@pytest.mark.parametrize("shape", V3_SHAPES)
@pytest.mark.parametrize("quantize", [False, True])
def test_v3_grad_bit_equal(shape, quantize):
    x = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    if quantize:
        x = jnp.maximum(jnp.round(x), 0.0)
    n, h, w, c = shape
    g = jax.random.normal(jax.random.key(2), (n, h // 2, w // 2, c),
                          jnp.float32)

    def loss(pool, xx):
        return jnp.vdot(pool(xx), g)

    dx = jax.grad(lambda xx: loss(max_pool_2x2_v3, xx))(x)
    dx_ref = jax.grad(lambda xx: loss(_ref_pool, xx))(x)
    np.testing.assert_array_equal(dx, dx_ref)


def test_v3_grad_all_tied_window():
    x = jnp.zeros((1, 2, 128, 16), jnp.float32)
    dx = jax.grad(lambda xx: jnp.sum(max_pool_2x2_v3(xx)))(x)
    expect = np.zeros((1, 2, 128, 16), np.float32)
    expect[0, 0, 0::2, :] = 1.0
    np.testing.assert_array_equal(dx, expect)


def test_v3_bf16_matches_ref():
    x = jax.random.normal(jax.random.key(3), (2, 8, 16, 32), jnp.bfloat16)
    y = max_pool_2x2_v3(x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(_ref_pool(x), np.float32)
    )


def test_v3_applicability():
    assert not _v3_applicable((1, 7, 8, 16))   # odd H
    assert not _v3_applicable((1, 8, 8, 3))    # 128 % 3 != 0
    assert not _v3_applicable((1, 8, 2, 64))   # W*C % 256 != 0
    assert _v3_applicable((1, 8, 4, 64))
