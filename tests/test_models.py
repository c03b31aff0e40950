import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models import init_model, net_factory


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "name,n_out",
    [("unet", 1), ("unet_cct", 2), ("unet_cct_3h", 3), ("unet_ds", 4),
     ("unet_urds", 4), ("pnet", 1), ("efficient_unet", 1)],
)
def test_factory_shapes(name, n_out):
    model = net_factory(name, class_num=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (2, 64, 64, 1))
    x = jnp.zeros((2, 64, 64, 1))
    out = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(1), "feature_perturb": jax.random.key(2)},
        mutable=["batch_stats"],
    )[0]
    outs = out if isinstance(out, (tuple, list)) else (out,)
    assert len(outs) == n_out
    for o in outs:
        assert o.shape == (2, 64, 64, 4)
        assert o.dtype == jnp.float32


def test_unet_param_count_matches_reference():
    """Analytic parameter count of the reference UNet (unet.py:286-303):
    conv k*k*cin*cout+cout, BN 2*cout, transpose 2*2*cin*cout+cout."""

    def conv(cin, cout, k=3):
        return k * k * cin * cout + cout

    def bn(c):
        return 2 * c

    def block(cin, cout):
        return conv(cin, cout) + bn(cout) + conv(cout, cout) + bn(cout)

    ft = [16, 32, 64, 128, 256]
    enc = block(1, ft[0]) + sum(block(ft[i], ft[i + 1]) for i in range(4))
    dec = 0
    for deep, skip in [(256, 128), (128, 64), (64, 32), (32, 16)]:
        dec += 2 * 2 * deep * skip + skip      # ConvTranspose2d(deep->skip)
        dec += block(2 * skip, skip)
    dec += conv(16, 4)                          # 3x3 out head
    expected = enc + dec

    model = net_factory("unet", class_num=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 1))
    assert _param_count(variables["params"]) == expected


def test_eval_deterministic():
    model = net_factory("unet", class_num=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 1))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1), jnp.float32)
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_cct_aux_differs_in_train():
    """Channel dropout must make the aux head differ from the main head."""
    model = net_factory("unet_cct", class_num=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 1))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 1), jnp.float32)
    (main, aux), _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(1), "feature_perturb": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(main), np.asarray(aux))


def test_discriminator_shape():
    from wsl4mis_tpu.models.discriminator import FCDiscriminator

    disc = FCDiscriminator(num_classes=4, dtype=jnp.float32)
    rngs = {"params": jax.random.key(0), "feature_perturb": jax.random.key(1)}
    seg = jnp.zeros((2, 256, 256, 4))
    img = jnp.zeros((2, 256, 256, 1))
    variables = disc.init(rngs, seg, img, train=False)
    out = disc.apply(variables, seg, img, train=False)
    assert out.shape == (2, 2)
