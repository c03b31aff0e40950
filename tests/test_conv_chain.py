"""Bit-parity of the flat-chained ConvBlock (WSL4MIS_CONV_CHAIN=flat)
against the 4D epilogue-stats path.

Outputs and batch_stats must match BITWISE (same values, same
row-major element order, incl. the dropout stream); parameter
gradients match to f32-accumulation-order tolerance.

The chain keeps conv1's output in the grouped (N, H, G, Nhat) layout —
byte-identical to the 4D row-major tensor when dense_chainable — so BN
apply, LeakyReLU and the dropout mask see the SAME values in the SAME
linear element order; outputs and gradients must match bitwise (both
paths use the conv-epilogue moments for BN stats).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models.unet import ConvBlock, UNet
from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
    dense_chainable,
    plan_banded,
)


@pytest.fixture()
def pallas_impl(monkeypatch):
    monkeypatch.setenv("WSL4MIS_CONV_IMPL", "pallas")
    monkeypatch.setenv("WSL4MIS_BN_STATS", "epilogue")


def _run(x, feats, dropout_p, chain, monkeypatch, dtype=jnp.float32):
    monkeypatch.setenv("WSL4MIS_CONV_CHAIN", "flat" if chain else "off")
    block = ConvBlock(feats, dropout_p, dtype=dtype)
    variables = block.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )

    def fwd(params, x):
        y, updates = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True,
            rngs={"dropout": jax.random.key(7)},
            mutable=["batch_stats"],
        )
        return y, updates

    y, updates = fwd(variables["params"], x)

    def loss(params, x):
        out, _ = fwd(params, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"], x)
    return y, updates["batch_stats"], g


@pytest.mark.parametrize("c,feats,h,w,p", [
    (16, 16, 16, 256, 0.05),   # encoder block1 shape family
    (1, 16, 16, 256, 0.05),    # the stem (c=1 small-c admission)
    (16, 32, 16, 128, 0.1),    # encoder block2
    (32, 64, 16, 64, 0.2),     # encoder block3
    (32, 16, 16, 256, 0.0),    # decoder UpBlock block (M=2 dense plan)
])
def test_chain_bit_parity(c, feats, h, w, p, pallas_impl, monkeypatch):
    assert dense_chainable(plan_banded(c, feats, h, w))
    x = jax.random.normal(jax.random.key(3), (2, h, w, c), jnp.float32)
    y1, bs1, g1 = _run(x, feats, p, False, monkeypatch)
    y2, bs2, g2 = _run(x, feats, p, True, monkeypatch)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def _by_key(tree):
        return sorted(
            ((jax.tree_util.keystr(p), v)
             for p, v in jax.tree_util.tree_leaves_with_path(tree)),
            key=lambda kv: kv[0],
        )

    for (k1, v1), (k2, v2) in zip(_by_key(bs1), _by_key(bs2)):
        assert k1 == k2
        np.testing.assert_array_equal(
            np.asarray(v1), np.asarray(v2), err_msg=k1
        )
    # gradients: identical math, but the grouped layout's reduction
    # tree differs from the 4D one, so f32 accumulation order differs
    for (k1, v1), (k2, v2) in zip(_by_key(g1), _by_key(g2)):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-4, atol=1e-3,
            err_msg=k1,
        )


def test_chain_param_tree_unchanged(pallas_impl, monkeypatch):
    """Checkpoints must be interchangeable between the two paths."""
    x = jnp.zeros((1, 16, 256, 1), jnp.float32)
    shapes = {}
    for chain in (False, True):
        monkeypatch.setenv("WSL4MIS_CONV_CHAIN", "flat" if chain else "off")
        block = ConvBlock(16, 0.05, dtype=jnp.float32)
        v = block.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=True,
        )
        shapes[chain] = jax.tree.map(lambda a: a.shape, v["params"])
    assert shapes[False] == shapes[True]


def test_chain_unet_forward_matches(pallas_impl, monkeypatch):
    """Whole-UNet train forward: chain on vs off, bit-equal logits."""
    x = jax.random.normal(jax.random.key(0), (1, 64, 256, 1), jnp.float32)
    outs = {}
    for chain in (False, True):
        monkeypatch.setenv("WSL4MIS_CONV_CHAIN", "flat" if chain else "off")
        net = UNet(num_classes=4, dtype=jnp.float32)
        v = net.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1),
             "feature_perturb": jax.random.key(2)},
            x, train=False,
        )
        y, _ = net.apply(
            v, x, train=True,
            rngs={"dropout": jax.random.key(7),
                  "feature_perturb": jax.random.key(8)},
            mutable=["batch_stats"],
        )
        outs[chain] = np.asarray(y)
    np.testing.assert_array_equal(outs[False], outs[True])
