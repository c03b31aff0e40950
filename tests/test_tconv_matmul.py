"""Bit-parity of the matmul transposed-conv lowering vs flax ConvTranspose."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.models.unet import TorchConvTranspose


def test_matmul_tconv_matches_flax(monkeypatch):
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 12), jnp.float32)
    mod = TorchConvTranspose(6, dtype=jnp.float32)

    monkeypatch.delenv("WSL4MIS_TCONV_IMPL", raising=False)
    v = mod.init(jax.random.key(1), x)
    ref = mod.apply(v, x)

    monkeypatch.setenv("WSL4MIS_TCONV_IMPL", "matmul")
    v2 = mod.init(jax.random.key(1), x)
    # identical param tree (names and shapes) -> checkpoints interchange
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    got = mod.apply(v, x)  # apply the matmul path with the flax params
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
