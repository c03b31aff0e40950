"""Device mesh + sharding helpers: the framework's distributed runtime.

The reference has no distributed layer at all — multi-GPU is approximated
by independent single-GPU processes (train_wss.sh). Here data parallelism is
first-class: a 1-D ``jax.sharding.Mesh`` over all local devices, training
batches sharded over the ``data`` axis, parameters/optimizer state
replicated. Gradient/batch-norm cross-replica reductions are *not* hand
written: the loss reduces over the globally-sharded batch axis, so XLA
inserts the ICI collectives (psum) itself under jit.

Scaling beyond one host follows the same pattern (jax.distributed +
multi-host mesh); nothing in the train step changes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over local devices (or an explicit list)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * batch_axis + [DATA_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, batch_axis: int = 0) -> dict:
    """Place a host batch dict onto the mesh, sharded along `batch_axis`
    (axis 0 normally; axis 1 for K-step-stacked batches).

    The batch dim must divide by the mesh size; scalar entries are passed
    through untouched.
    """
    sharding = batch_sharding(mesh, batch_axis)
    n = mesh.devices.size

    def put(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) > batch_axis:
            if x.shape[batch_axis] % n != 0:
                raise ValueError(
                    f"batch dim {x.shape[batch_axis]} not divisible by "
                    f"mesh size {n}"
                )
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
