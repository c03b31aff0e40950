"""FusedBatchNorm == flax BatchNorm (f32 exactly; bf16 to rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from wsl4mis_tpu.models.norm import FusedBatchNorm


def _flax_bn(train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("train", [True, False])
def test_matches_flax_f32(train):
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 8, 8, 16) * 3 + 1, jnp.float32
    )
    ref = _flax_bn(train)
    ours = FusedBatchNorm(use_running_average=not train)
    vr = ref.init(jax.random.key(0), x)
    vo = ours.init(jax.random.key(0), x)
    # same variable tree (param/stat names interchangeable in checkpoints)
    assert jax.tree.structure(vr) == jax.tree.structure(vo)
    # give both the same non-trivial state
    stats = {"mean": jnp.arange(16.0) * 0.1, "var": jnp.arange(16.0) * 0.2 + 1}
    params = {"scale": jnp.linspace(0.5, 2, 16), "bias": jnp.linspace(-1, 1, 16)}
    yr, mr = ref.apply(
        {"params": params, "batch_stats": stats}, x, mutable=["batch_stats"]
    )
    yo, mo = ours.apply(
        {"params": params, "batch_stats": stats}, x, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yo), atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mr["batch_stats"][k]),
            np.asarray(mo["batch_stats"][k]),
            atol=2e-5,
        )


def test_bf16_output_dtype_and_value():
    x32 = np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    ours = FusedBatchNorm(use_running_average=False)
    v = ours.init(jax.random.key(0), x)
    y, _ = ours.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    ref = _flax_bn(True)
    yr, _ = ref.apply(v, jnp.asarray(x32), mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr), atol=0.05, rtol=0.05
    )


def test_unet_checkpoint_tree_unchanged():
    """Switching BN impls must not change the parameter tree paths."""
    import os

    from wsl4mis_tpu.models import init_model, net_factory

    assert os.environ.get("WSL4MIS_BN_IMPL", "fused") == "fused"
    model = net_factory("unet", class_num=4, dtype=jnp.float32)
    v = init_model(model, jax.random.key(0), (1, 32, 32, 1))
    flat = ["/".join(str(k.key) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(v["params"])[0]]
    assert any("BatchNorm_0/scale" in f for f in flat)
    assert any("BatchNorm_1/bias" in f for f in flat)
