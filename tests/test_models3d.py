import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models.nets3d import (
    instance_norm,
    net_factory_3d,
    upsample3d,
)


@pytest.mark.parametrize(
    "name", ["unet_3D", "attention_unet", "vnet", "voxresnet"]
)
def test_factory3d_shapes(name):
    model = net_factory_3d(name, class_num=2, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)
    assert out.dtype == jnp.float32

    # train mode (BN mutation + dropout) also works
    out2, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_instance_norm_stats(rng):
    x = jnp.asarray(rng.rand(2, 4, 4, 4, 3).astype(np.float32) * 5 + 3)
    y = np.asarray(instance_norm(x))
    m = y.mean(axis=(1, 2, 3))
    s = y.std(axis=(1, 2, 3))
    assert np.allclose(m, 0, atol=1e-4)
    assert np.allclose(s, 1, atol=1e-3)


def test_upsample3d_matches_torch_trilinear(rng):
    import torch
    import torch.nn.functional as F

    x = rng.rand(1, 4, 6, 5, 2).astype(np.float32)
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    for align in (False, True):
        ref = F.interpolate(
            tx, scale_factor=2, mode="trilinear", align_corners=align
        )
        got = np.asarray(upsample3d(jnp.asarray(x), 2, align_corners=align))
        assert np.allclose(
            got, np.moveaxis(ref.numpy(), 1, -1), atol=1e-5
        ), f"align_corners={align}"


def test_unknown_3d_net():
    with pytest.raises(KeyError):
        net_factory_3d("resnet50")
