"""Diagnose the scribblevc single-vs-8-device parity divergence.

Prints loss diff, per-collection max param diff, and class_memory diffs so
we can tell benign f32 reassociation apart from a flipped discrete gate
(VERDICT round-2 weak #1).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from wsl4mis_tpu.engine.config import TrainConfig  # noqa: E402
from wsl4mis_tpu.engine.methods import get_method  # noqa: E402
from wsl4mis_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    replicate_tree,
    shard_batch,
)


def main():
    cfg = TrainConfig(
        method="scribblevc",
        sup_type="scribble",
        batch_size=8,
        labeled_bs=4,
        max_iterations=2,
        patch_size=(64, 64),
        compute_dtype="float32",
        data_limit=16,
        thr_iter=0,
    )
    bundle = get_method("scribblevc").build(cfg)
    batch = next(bundle.data_iter)
    rng = jax.random.key(0)

    state1, m1 = jax.jit(bundle.step_fn)(bundle.state, batch, rng, bundle.aux)

    mesh = make_mesh()
    bundle2 = get_method("scribblevc").build(cfg)
    state_r = replicate_tree(mesh, bundle2.state)
    sharded = shard_batch(mesh, batch)
    aux_r = replicate_tree(mesh, bundle2.aux) if bundle2.aux is not None else None
    state2, m2 = jax.jit(bundle2.step_fn)(state_r, sharded, rng, aux_r)

    l1, l2 = float(m1["total_loss"]), float(m2["total_loss"])
    print(f"loss single={l1!r} mesh={l2!r} absdiff={abs(l1-l2):.3e} "
          f"reldiff={abs(l1-l2)/max(1.0, abs(l1)):.3e}")
    for k in sorted(m1):
        if not hasattr(m1[k], "shape") and not isinstance(m1[k], (int, float)):
            continue  # e.g. the "vis" image dict
        v1, v2 = float(np.asarray(m1[k])), float(np.asarray(m2[k]))
        print(f"  metric {k}: {v1:.6f} vs {v2:.6f} (diff {abs(v1-v2):.3e})")

    def flat(tree):
        return {
            jax.tree_util.keystr(kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    p1, p2 = flat(state1.params), flat(state2.params)
    worst = sorted(
        ((np.abs(p1[k] - p2[k]).max(), k) for k in p1), reverse=True
    )[:8]
    print("worst param diffs:")
    for d, k in worst:
        print(f"  {d:.3e}  {k}")
    if state1.extra is not None:
        e1, e2 = flat(state1.extra), flat(state2.extra)
        print("extra (class_memory etc.) diffs:")
        for k in sorted(e1):
            a, b = e1[k], e2[k]
            print(
                f"  {k}: maxabsdiff={np.abs(a-b).max():.3e} "
                f"|a|max={np.abs(a).max():.3e} |b|max={np.abs(b).max():.3e}"
            )


if __name__ == "__main__":
    main()
