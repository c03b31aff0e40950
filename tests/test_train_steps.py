"""One-step smoke tests for every training method on tiny data (SURVEY §4d)."""

import jax
import numpy as np
import pytest

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import available_methods, get_method

FAST_METHODS = [
    "fully_supervised",
    "pce",
    "pce_tv",
    "pce_entropy_mini",
    "pce_mumford_shah",
    "pce_intensity_variance",
    "dmpls",
    "mean_teacher",
    "entropy_minimization",
    "partially_supervised",
    "s2l",
]
SLOW_METHODS = ["pce_gatedcrf", "ustm", "uamt", "deep_adversarial", "scribblevc"]
# runs the random-walker data prep into a tmp tree first (own test below)
DATA_PREP_METHODS = ["pce_random_walker"]


def _cfg(method):
    sup = (
        "scribble"
        if method.startswith(("pce", "dmpls", "ustm", "s2l"))
        else "label"
    )
    return TrainConfig(
        method=method,
        sup_type=sup,
        batch_size=4,
        max_iterations=2,
        patch_size=(64, 64),
        compute_dtype="float32",
        data_limit=16,
        thr_iter=0,
    )


def _run_steps(method, n=2):
    cfg = _cfg(method)
    bundle = get_method(method).build(cfg)
    state = bundle.state
    step = jax.jit(bundle.step_fn)
    losses = []
    for i in range(n):
        batch = next(bundle.data_iter)
        state, metrics = step(state, batch, jax.random.key(i), bundle.aux)
        losses.append(float(metrics["total_loss"]))
    return state, losses


@pytest.mark.parametrize("method", FAST_METHODS)
def test_one_step_fast(method):
    state, losses_ = _run_steps(method)
    assert all(np.isfinite(losses_)), losses_
    assert int(state.step) == 2


@pytest.mark.slow
@pytest.mark.parametrize("method", SLOW_METHODS)
def test_one_step_slow(method):
    state, losses_ = _run_steps(method)
    assert all(np.isfinite(losses_)), losses_


def test_params_change():
    cfg = _cfg("fully_supervised")
    bundle = get_method("fully_supervised").build(cfg)
    before = jax.tree.map(np.asarray, bundle.state.params)
    state, _ = _run_steps("fully_supervised")
    after = jax.tree.map(np.asarray, state.params)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree.leaves(diffs)) > 0


def test_registry_covers_all():
    assert set(FAST_METHODS + SLOW_METHODS + DATA_PREP_METHODS) == set(
        available_methods()
    )


def test_one_step_random_walker(tmp_path_factory, acdc_root):
    """End-to-end pce_random_walker: run the RW data prep on a few bundled
    slices into a tmp H5 tree, then train one step on the pseudo labels
    (reference acdc_pseudo_label_random_walker.py:44-59 +
    train_weakly_supervised_pCE_random_walker_2D.py)."""
    from wsl4mis_tpu.data.random_walker import prepare_random_walker_tree

    out = str(tmp_path_factory.mktemp("acdc_rw"))
    # patient021 is in fold1's train split (fold1 holds out patients 1-20).
    n = prepare_random_walker_tree(acdc_root, out, limit=6,
                                   cases=["patient021"])
    assert n == 6
    # one fold1 val volume (patient001), no slices needed for it
    prepare_random_walker_tree(acdc_root, out, limit=0,
                               cases=["patient001"])

    cfg = _cfg("pce_random_walker").replace(
        sup_type="random_walker", root_path=out, data_limit=6,
    )
    bundle = get_method("pce_random_walker").build(cfg)
    assert bundle.val_volumes.cases  # patient001 volume found
    step = jax.jit(bundle.step_fn)
    state = bundle.state
    for i in range(2):
        batch = next(bundle.data_iter)
        state, metrics = step(state, batch, jax.random.key(i), bundle.aux)
        assert np.isfinite(float(metrics["total_loss"]))
