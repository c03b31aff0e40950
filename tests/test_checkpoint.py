import os

import jax
import numpy as np

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_train_state,
    save_model_checkpoint,
    save_train_state,
)


def _bundle():
    cfg = TrainConfig(
        method="fully_supervised", sup_type="label", batch_size=4,
        patch_size=(64, 64), compute_dtype="float32", data_limit=8,
    )
    return cfg, get_method(cfg.method).build(cfg)


def test_model_checkpoint_roundtrip(tmp_path):
    _, bundle = _bundle()
    path = os.path.join(tmp_path, "unet_best_model.pth")
    save_model_checkpoint(path, bundle.state)
    restored = load_checkpoint(path)
    assert set(restored) == {"params", "batch_stats", "step"}
    orig = jax.tree.leaves(jax.tree.map(np.asarray, bundle.state.params))
    back = jax.tree.leaves(restored["params"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(a, b)


def test_full_resume_roundtrip(tmp_path):
    cfg, bundle = _bundle()
    state = bundle.state
    step = jax.jit(bundle.step_fn)
    batch = next(bundle.data_iter)
    state, _ = step(state, batch, jax.random.key(0), bundle.aux)
    path = os.path.join(tmp_path, "latest_full.ckpt")
    save_train_state(path, state)

    _, bundle2 = _bundle()
    restored = restore_train_state(path, bundle2.state)
    assert int(restored.step) == 1
    a = jax.tree.leaves(jax.tree.map(np.asarray, state.opt_state))
    b = jax.tree.leaves(jax.tree.map(np.asarray, restored.opt_state))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # training continues identically from a restored state
    batch2 = next(bundle.data_iter)
    s1, m1 = step(state, batch2, jax.random.key(1), bundle.aux)
    s2, m2 = jax.jit(bundle2.step_fn)(restored, batch2, jax.random.key(1), bundle2.aux)
    assert abs(float(m1["total_loss"]) - float(m2["total_loss"])) < 1e-6
