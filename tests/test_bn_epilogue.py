"""Parity for the conv-epilogue BN moments path (WSL4MIS_BN_STATS).

banded_conv3x3_pallas_stats must return the same y as the plain kernel
plus per-channel f32 moments matching an XLA reduce over the stored y;
its VJP folds the moment cotangents into dy exactly (1 and 2y). At the
model level, ConvBlock with the knob on must match the default path to
f32-reduction-order accuracy (outputs, grads, batch_stats updates).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (  # noqa: E402
    banded_conv3x3_pallas,
    banded_conv3x3_pallas_stats,
    plan_banded,
)


def _mk(c=16, o=16, h=64, w=48, n=2, dtype=jnp.bfloat16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, h, w, c), dtype)
    k = (jax.random.normal(k2, (3, 3, c, o)) * 0.2).astype(dtype)
    b = (jax.random.normal(k3, (o,)) * 0.1).astype(dtype)
    return x, k, b


@pytest.mark.parametrize("c,o,w", [(16, 16, 48), (32, 16, 40), (16, 32, 47)])
def test_stats_forward_matches_reduce(c, o, w):
    x, k, b = _mk(c=c, o=o, w=w)
    assert plan_banded(c, o, x.shape[1], w) is not None
    y0 = banded_conv3x3_pallas(x, k, b, interpret=True)
    y, s1, s2 = banded_conv3x3_pallas_stats(x, k, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y0, np.float32))
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(np.asarray(s1), yf.sum((0, 1, 2)),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (yf * yf).sum((0, 1, 2)),
                               rtol=1e-5, atol=1e-3)


def test_stats_grad_matches_explicit_reduce():
    # f32 so the comparison is decisive: in bf16 the two paths differ by
    # O(eps*sqrt(n)) accumulation noise in dk (both are equally "right")
    x, k, b = _mk(dtype=jnp.float32)
    n_el = x.shape[0] * x.shape[1] * x.shape[2]

    def loss_stats(x, k, b):
        y, s1, s2 = banded_conv3x3_pallas_stats(x, k, b, interpret=True)
        mean = s1 / n_el
        var = jnp.maximum(s2 / n_el - mean ** 2, 0.0)
        z = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(jax.nn.leaky_relu(z, 0.01) ** 2)

    def loss_ref(x, k, b):
        y = banded_conv3x3_pallas(x, k, b, interpret=True)
        yf = y.astype(jnp.float32)
        mean = jnp.sum(yf, (0, 1, 2)) / n_el
        var = jnp.maximum(jnp.sum(yf * yf, (0, 1, 2)) / n_el - mean ** 2, 0.0)
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(jax.nn.leaky_relu(z, 0.01) ** 2)

    v1, g1 = jax.value_and_grad(loss_stats, argnums=(0, 1, 2))(x, k, b)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, bb in zip(g1, g2):
        # atol 2e-3: db is a cancellation-dominated sum (BN removes the
        # bias, true db ~ 0) where f32 association order leaves ~3e-4
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=1e-4, atol=2e-3,
        )


def test_convblock_epilogue_knob_parity():
    from wsl4mis_tpu.models.unet import ConvBlock

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 16),
                          jnp.bfloat16)
    blk = ConvBlock(features=16, dropout_p=0.0)
    saved = {
        "WSL4MIS_BN_STATS": os.environ.pop("WSL4MIS_BN_STATS", None),
        "WSL4MIS_CONV_IMPL": os.environ.pop("WSL4MIS_CONV_IMPL", None),
    }
    try:
        os.environ["WSL4MIS_CONV_IMPL"] = "direct"
        vars0 = blk.init(jax.random.PRNGKey(2), x, train=True)

        def run(x):
            y, upd = blk.apply(
                vars0, x, train=True, mutable=["batch_stats"]
            )
            return y, upd

        y_ref, upd_ref = run(x)
        os.environ["WSL4MIS_BN_STATS"] = "epilogue"
        os.environ["WSL4MIS_CONV_IMPL"] = "pallas"
        y_ep, upd_ep = run(x)
    finally:
        for kk, vv in saved.items():
            os.environ.pop(kk, None)
            if vv is not None:
                os.environ[kk] = vv
    np.testing.assert_allclose(
        np.asarray(y_ep, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.02, atol=0.02,  # bf16 activations, distinct matmul orders
    )
    for pth in ("BatchNorm_0", "BatchNorm_1"):
        for st in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_ep["batch_stats"][pth][st]),
                np.asarray(upd_ref["batch_stats"][pth][st]),
                rtol=2e-2, atol=2e-3,
            )
