"""Multi-device (virtual 8-CPU mesh) sharding tests — SURVEY §4e."""

import jax
import numpy as np
import pytest

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_rejects_indivisible():
    mesh = make_mesh()
    with pytest.raises(ValueError):
        shard_batch(mesh, {"image": np.zeros((6, 4, 4), np.float32)})


def test_data_parallel_step_matches_single_device():
    """The sharded step must compute the same update as single-device."""
    cfg = TrainConfig(
        method="fully_supervised", sup_type="label", batch_size=8,
        patch_size=(64, 64), compute_dtype="float32", data_limit=16,
    )
    bundle = get_method("fully_supervised").build(cfg)
    batch = next(bundle.data_iter)
    rng = jax.random.key(0)

    state1, m1 = jax.jit(bundle.step_fn)(bundle.state, batch, rng, bundle.aux)

    mesh = make_mesh()
    bundle2 = get_method("fully_supervised").build(cfg)
    state_r = replicate_tree(mesh, bundle2.state)
    sharded = shard_batch(mesh, batch)
    aux_r = jax.device_put(bundle2.aux) if bundle2.aux is not None else None
    state2, m2 = jax.jit(bundle2.step_fn)(state_r, sharded, rng, aux_r)

    assert abs(float(m1["total_loss"]) - float(m2["total_loss"])) < 1e-5
    p1 = jax.tree.leaves(jax.tree.map(np.asarray, state1.params))
    p2 = jax.tree.leaves(jax.tree.map(np.asarray, state2.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, atol=1e-5)
