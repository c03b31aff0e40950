"""Bit-parity of the flat encoder pool seams (WSL4MIS_POOL_CHAIN=flat).

The flat path keeps ConvBlock -> maxpool -> ConvBlock in the dense flat
(N, H, W*C) domain: the producer conv emits its raw grouped output
(byte-identical to row-major 4D when dense_chainable), the selection-
matmul pool runs on the same bytes, and the consumer conv takes the flat
tensor with one dense-lane pad. Every tensor in the seam carries the same
values in the same row-major element order as the 4D path, so forward
outputs and batch_stats must match BITWISE, and parameter gradients to
f32-accumulation-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models.unet import UNet, _flat_seam_ok
from wsl4mis_tpu.ops.maxpool import (
    _v3_applicable,
    max_pool_2x2_flat,
    max_pool_2x2_v3,
)


@pytest.fixture()
def flat_env(monkeypatch):
    monkeypatch.setenv("WSL4MIS_CONV_IMPL", "pallas")
    monkeypatch.setenv("WSL4MIS_CONV_CHAIN", "flat")
    monkeypatch.setenv("WSL4MIS_POOL_IMPL", "fused3")


@pytest.mark.parametrize("c", [16, 32, 64])
def test_max_pool_flat_matches_v3(c):
    n, h, w = 2, 8, 256 // c * 8
    x = jax.random.normal(jax.random.key(0), (n, h, w, c), jnp.float32)
    # tie-heavy variant: post-ReLU maps tie at 0 constantly
    x = jnp.where(x < 0.3, 0.0, x)
    assert _v3_applicable(x.shape)
    xf = x.reshape(n, h, w * c)

    y4, vjp4 = jax.vjp(max_pool_2x2_v3, x)
    yf, vjpf = jax.vjp(lambda a: max_pool_2x2_flat(a, c), xf)
    np.testing.assert_array_equal(
        np.asarray(y4).reshape(yf.shape), np.asarray(yf)
    )
    g = jax.random.normal(jax.random.key(1), y4.shape, jnp.float32)
    (dx4,) = vjp4(g)
    (dxf,) = vjpf(g.reshape(yf.shape))
    np.testing.assert_array_equal(
        np.asarray(dx4).reshape(dxf.shape), np.asarray(dxf)
    )


def _unet_run(x, pool_chain, monkeypatch):
    monkeypatch.setenv("WSL4MIS_POOL_CHAIN", "flat" if pool_chain else "off")
    net = UNet(num_classes=4, dtype=jnp.float32)
    v = net.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )

    def fwd(params, x):
        return net.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True,
            rngs={"dropout": jax.random.key(7)},
            mutable=["batch_stats"],
        )

    y, updates = fwd(v["params"], x)

    def loss(params):
        out, _ = fwd(params, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(v["params"])
    return np.asarray(y), updates["batch_stats"], g


def test_flat_seams_engage(flat_env, monkeypatch):
    monkeypatch.setenv("WSL4MIS_POOL_CHAIN", "flat")
    assert _flat_seam_ok((2, 64, 256, 1), 16, 32, True)
    assert not _flat_seam_ok((2, 64, 256, 1), 16, 32, False)  # eval: off


def test_unet_flat_pool_chain_bit_parity(flat_env, monkeypatch):
    x = jax.random.normal(jax.random.key(3), (1, 64, 256, 1), jnp.float32)
    y_off, bs_off, g_off = _unet_run(x, False, monkeypatch)
    y_on, bs_on, g_on = _unet_run(x, True, monkeypatch)
    np.testing.assert_array_equal(y_off, y_on)

    def _by_key(tree):
        return sorted(
            ((jax.tree_util.keystr(p), v)
             for p, v in jax.tree_util.tree_leaves_with_path(tree)),
            key=lambda kv: kv[0],
        )

    for (k1, v1), (k2, v2) in zip(_by_key(bs_off), _by_key(bs_on)):
        assert k1 == k2
        np.testing.assert_array_equal(
            np.asarray(v1), np.asarray(v2), err_msg=k1
        )
    for (k1, v1), (k2, v2) in zip(_by_key(g_off), _by_key(g_on)):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-4, atol=1e-3,
            err_msg=k1,
        )


def test_unet_up_chain_parity(flat_env, monkeypatch):
    """Decoder flat path (WSL4MIS_UP_CHAIN=flat): the split-kernel conv
    replaces the channel concat. Each half accumulates in its own kernel
    before the sum, so parity is to accumulation-order tolerance (f32),
    not bitwise."""
    monkeypatch.setenv("WSL4MIS_TCONV_IMPL", "matmul")
    x = jax.random.normal(jax.random.key(5), (1, 64, 256, 1), jnp.float32)
    monkeypatch.setenv("WSL4MIS_UP_CHAIN", "off")
    y_off, bs_off, g_off = _unet_run(x, True, monkeypatch)
    monkeypatch.setenv("WSL4MIS_UP_CHAIN", "flat")
    y_on, bs_on, g_on = _unet_run(x, True, monkeypatch)
    np.testing.assert_allclose(y_off, y_on, rtol=1e-4, atol=1e-4)

    def _by_key(tree):
        return sorted(
            ((jax.tree_util.keystr(p), v)
             for p, v in jax.tree_util.tree_leaves_with_path(tree)),
            key=lambda kv: kv[0],
        )

    for (k1, v1), (k2, v2) in zip(_by_key(bs_off), _by_key(bs_on)):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-4, atol=1e-5,
            err_msg=k1,
        )
    for (k1, v1), (k2, v2) in zip(_by_key(g_off), _by_key(g_on)):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-3, atol=1e-2,
            err_msg=k1,
        )


def test_unet_up_chain_param_tree_unchanged(flat_env, monkeypatch):
    """Split-conv path must keep the concat path's param tree."""
    monkeypatch.setenv("WSL4MIS_TCONV_IMPL", "matmul")
    x = jnp.zeros((1, 64, 256, 1), jnp.float32)
    shapes = {}
    for up in ("off", "flat"):
        monkeypatch.setenv("WSL4MIS_UP_CHAIN", up)
        monkeypatch.setenv("WSL4MIS_POOL_CHAIN", "flat")
        net = UNet(num_classes=4, dtype=jnp.float32)
        v = net.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=True,
        )
        shapes[up] = jax.tree.map(lambda a: a.shape, v["params"])
    assert shapes["off"] == shapes["flat"]


def test_unet_param_tree_unchanged(flat_env, monkeypatch):
    """Checkpoints interchangeable between flat-seam and 4D paths."""
    x = jnp.zeros((1, 64, 256, 1), jnp.float32)
    shapes = {}
    for pc in (False, True):
        monkeypatch.setenv("WSL4MIS_POOL_CHAIN", "flat" if pc else "off")
        net = UNet(num_classes=4, dtype=jnp.float32)
        v = net.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=True,
        )
        shapes[pc] = jax.tree.map(lambda a: a.shape, v["params"])
    assert shapes[False] == shapes[True]
