"""Bit-parity of the Pallas 2x2 max pool (ops/pallas/maxpool_pallas.py)
against flax's reduce-window path — forward and gradient, including the
first-max tie routing — in interpreter mode, plus both _compact
lowerings."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from wsl4mis_tpu.ops.pallas.maxpool_pallas import max_pool_2x2_pallas


def _pool(x):
    return max_pool_2x2_pallas(x, interpret=True)


def _ref_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (3, 16, 12, 5),
                                   (1, 256, 256, 16)])
def test_forward_bit_equal(shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    np.testing.assert_array_equal(_pool(x), _ref_pool(x))


def test_forward_compact_reshape_mode():
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 4), jnp.float32)
    os.environ["WSL4MIS_POOL_COMPACT"] = "reshape"
    try:
        np.testing.assert_array_equal(_pool(x), _ref_pool(x))
    finally:
        del os.environ["WSL4MIS_POOL_COMPACT"]


@pytest.mark.parametrize("quantize", [False, True])
def test_grad_bit_equal(quantize):
    x = jax.random.normal(jax.random.key(1), (2, 12, 16, 4), jnp.float32)
    if quantize:
        # Heavy ties (incl. whole windows of equal values), the post-ReLU
        # regime where first-max routing actually matters.
        x = jnp.round(x)
        x = jnp.maximum(x, 0.0)
    g = jax.random.normal(jax.random.key(2), (2, 6, 8, 4), jnp.float32)

    def loss(pool, xx):
        return jnp.vdot(pool(xx), g)

    dx = jax.grad(lambda xx: loss(_pool, xx))(x)
    dx_ref = jax.grad(lambda xx: loss(_ref_pool, xx))(x)
    np.testing.assert_array_equal(dx, dx_ref)


def test_grad_all_tied_window():
    """A fully-tied window must send the whole cotangent to tap (0,0)."""
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    dx = jax.grad(lambda xx: jnp.sum(_pool(xx)))(x)
    dx_ref = jax.grad(lambda xx: jnp.sum(_ref_pool(xx)))(x)
    np.testing.assert_array_equal(dx, dx_ref)
    assert float(dx[0, 0, 0, 0]) == 1.0
    assert float(jnp.sum(dx)) == 4.0


def test_bf16_roundtrip():
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 16), jnp.bfloat16)
    y = _pool(x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        y.astype(jnp.float32), _ref_pool(x).astype(jnp.float32)
    )
    g = jnp.ones((2, 16, 16, 16), jnp.bfloat16)
    dx = jax.grad(
        lambda xx: jnp.vdot(_pool(xx).astype(jnp.float32),
                            g.astype(jnp.float32))
    )(x)
    dx_ref = jax.grad(
        lambda xx: jnp.vdot(_ref_pool(xx).astype(jnp.float32),
                            g.astype(jnp.float32))
    )(x)
    np.testing.assert_array_equal(dx.astype(jnp.float32),
                                  dx_ref.astype(jnp.float32))
