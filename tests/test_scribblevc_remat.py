"""remat=True (checkpointed Conformer stages, cfg.remat / --remat) is
jax.checkpoint around each ConvTransBlock: semantics-preserving modulo
f32 reassociation. Per-block fwd+grad parity is tight; at full depth the
12-stage trunk amplifies the ~1e-6 reassociation noise multiplicatively,
so the full-model check is a finite-loss/finite-grad smoke."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.models.scribblevc import ConvTransBlock, ScribbleVC


def test_remat_block_parity():
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 256), jnp.float32)
    t = jax.random.uniform(jax.random.key(2), (2, 257, 384), jnp.float32)
    args = (256, False, 1, 4, 384, 6, 0.0)
    m0 = ConvTransBlock(*args, dtype=jnp.float32)
    m1 = nn.remat(ConvTransBlock, static_argnums=(3,))(
        *args, dtype=jnp.float32
    )
    v = m0.init({"params": jax.random.key(0)}, x, t, False)

    outs, grads = {}, {}
    for tag, m in (("plain", m0), ("remat", m1)):
        def loss(params):
            h, tt = m.apply({**v, "params": params}, x, t, False)
            return jnp.mean(h**2) + jnp.mean(tt**2)

        outs[tag] = m.apply(v, x, t, False)
        grads[tag] = jax.grad(loss)(v["params"])

    for a, b in zip(jax.tree.leaves(outs["plain"]), jax.tree.leaves(outs["remat"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(grads["plain"]), jax.tree.leaves(grads["remat"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_remat_full_model_trains():
    x = jax.random.uniform(jax.random.key(1), (2, 256, 256, 1), jnp.float32)
    model = ScribbleVC(num_classes=4, dtype=jnp.float32, batch_size=2,
                       remat=True)
    variables = dict(
        model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, 256, 256, 1), jnp.float32), train=False,
        )
    )

    def loss(params):
        out, _ = model.apply(
            {**variables, "params": params}, x, train=True,
            rngs={"dropout": jax.random.key(7)},
            mutable=["batch_stats", "class_memory"],
        )
        return jnp.mean(out[0] ** 2) + jnp.mean(out[1] ** 2)

    val, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0
