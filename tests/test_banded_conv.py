"""Banded-matmul 3x3 conv == lax.conv (fwd + grads), and the model hook."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.ops.banded_conv import (
    banded_conv3x3,
    band_weights,
    small_channel_eligible,
)


def _ref(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b


@pytest.mark.parametrize(
    "shape", [(2, 16, 16, 16, 16), (1, 8, 13, 4, 8), (2, 32, 30, 16, 32),
              (1, 7, 6, 3, 5), (1, 5, 37, 1, 16)]
)
def test_forward_parity(shape):
    n, h, w, c, o = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c, o) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(o), jnp.float32)

    @jax.jit
    def run(x, k, b):
        return _ref(x, k, b), banded_conv3x3(x, k, b)

    ref, got = run(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_grad_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 17, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)

    @jax.jit
    def grads(k, x):
        g1 = jax.grad(lambda k2, x2: jnp.sum(jnp.sin(_ref(x2, k2))),
                      (0, 1))(k, x)
        g2 = jax.grad(
            lambda k2, x2: jnp.sum(jnp.sin(banded_conv3x3(x2, k2))), (0, 1)
        )(k, x)
        return g1, g2

    (dk1, dx1), (dk2, dx2) = grads(k, x)
    np.testing.assert_allclose(np.asarray(dk2), np.asarray(dk1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), atol=1e-4)


def test_band_structure():
    k = jnp.arange(3 * 3 * 2 * 3, dtype=jnp.float32).reshape(3, 3, 2, 3)
    wb = np.asarray(band_weights(k))  # (3, 16, 18)
    c, o, J = 2, 3, 6
    for dy in range(3):
        for p in range(8):
            for j in range(J):
                blk = wb[dy, p * c:(p + 1) * c, j * o:(j + 1) * o]
                dx = p - j
                if 0 <= dx <= 2:
                    np.testing.assert_array_equal(blk, np.asarray(k[dy, dx]))
                else:
                    assert (blk == 0).all()


def test_eligibility():
    assert small_channel_eligible((3, 3, 16, 16))
    assert small_channel_eligible((3, 3, 32, 32))
    assert not small_channel_eligible((3, 3, 64, 64))
    assert not small_channel_eligible((1, 1, 16, 16))
    assert not small_channel_eligible((3, 3, 16, 16), strides=(2, 2))


def test_unet_banded_env_matches_default():
    """The env-gated model path computes the same function."""
    from wsl4mis_tpu.models import init_model, net_factory

    model = net_factory("unet", class_num=4, dtype=jnp.float32)
    v = init_model(model, jax.random.key(0), (1, 32, 32, 1))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 1), jnp.float32)
    base = model.apply(v, x, train=False)
    os.environ["WSL4MIS_CONV_IMPL"] = "banded"
    try:
        banded = model.apply(v, x, train=False)
    finally:
        del os.environ["WSL4MIS_CONV_IMPL"]
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(base), atol=2e-4
    )
