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


# Every runnable method must compute the same update on the 8-device mesh
# as on a single device (pce_random_walker shares fully_supervised's step
# and needs prepared data — covered by its own fixture test).
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
SLOW_METHODS = ["pce_gatedcrf", "ustm", "uamt", "deep_adversarial",
                "scribblevc"]


def _cfg(method):
    sup = (
        "scribble"
        if method.startswith(("pce", "dmpls", "ustm", "s2l", "scribblevc"))
        else "label"
    )
    return TrainConfig(
        method=method,
        sup_type=sup,
        batch_size=8,
        labeled_bs=4,
        max_iterations=2,
        patch_size=(64, 64),
        compute_dtype="float32",
        data_limit=16,
        thr_iter=0,
    )


def _tree_allclose(t1, t2, atol):
    l1 = jax.tree.leaves(jax.tree.map(np.asarray, t1))
    l2 = jax.tree.leaves(jax.tree.map(np.asarray, t2))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, atol=atol)


# ScribbleVC's class-memory prototypes come out of a batch contraction
# (einsum "bi,bhwc->ihwc") whose intermediate products reach ~1e4 (logits
# ~1e2 x features ~1e1 x pixels), so the sharded reduction's f32
# reassociation noise is eps * intermediate ~ 1e-2 ABSOLUTE regardless of
# the final entry's size (measured: max 0.013 after one memory step). A
# flipped discrete gate (is-class-max / sigmoid<0.5) instead zeroes or
# injects a whole prototype row — an O(1)-O(200) jump. So: loose atol for
# reassociation, a hard 0.5 ceiling as the gate-flip detector.
MEMORY_REASSOC_ATOL = 0.05
GATE_FLIP_FLOOR = 0.5


def _extra_allclose(t1, t2, atol):
    f1 = jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, t1))[0]
    f2 = jax.tree.leaves(jax.tree.map(np.asarray, t2))
    assert len(f1) == len(f2)
    for (path, a), b in zip(f1, f2):
        name = jax.tree_util.keystr(path)
        if "hist_conv" in name or "hist_tran" in name:
            worst = float(np.max(np.abs(a - b)))
            assert worst < GATE_FLIP_FLOOR, (
                f"{name}: diff {worst} — a discrete memory gate flipped "
                "between single-device and mesh execution"
            )
            np.testing.assert_allclose(
                a, b, atol=MEMORY_REASSOC_ATOL, err_msg=name
            )
        else:
            np.testing.assert_allclose(a, b, atol=atol, err_msg=name)


def _run_parity(method, param_atol=1e-4, advance_step: int | None = None):
    """Single-device step vs 8-device sharded step: params, extra state,
    and loss must agree to float tolerance.

    param_atol: Adam-family optimizers amplify a reassociation-flipped
    sign of a near-zero gradient into a full +-lr step on that weight
    (measured: scribblevc/AdamW(5e-4) params differ by exactly 2*lr=1e-3
    on a handful of conv kernels while every loss term agrees to ~1e-5
    relative — diag round 3). So the per-method bound is ~2.2x the
    optimizer lr, NOT a universal 1e-4; a real sharding bug shows up as
    loss/extra divergence, which stays on tight relative bounds.

    advance_step: optionally bump state.step before the measured step so
    step-gated branches (ScribbleVC's class memory after epoch 4) run.
    """
    cfg = _cfg(method)
    bundle = get_method(method).build(cfg)
    batch = next(bundle.data_iter)
    rng = jax.random.key(0)

    state0 = bundle.state
    if advance_step is not None:
        import jax.numpy as jnp

        state0 = state0.replace(step=jnp.asarray(advance_step, state0.step.dtype))
    state1, m1 = jax.jit(bundle.step_fn)(state0, batch, rng, bundle.aux)

    mesh = make_mesh()
    bundle2 = get_method(method).build(cfg)
    state_r = replicate_tree(mesh, bundle2.state)
    if advance_step is not None:
        import jax.numpy as jnp

        state_r = state_r.replace(
            step=replicate_tree(
                mesh, jnp.asarray(advance_step, bundle2.state.step.dtype)
            )
        )
    sharded = shard_batch(mesh, batch)
    aux_r = (
        replicate_tree(mesh, bundle2.aux) if bundle2.aux is not None else None
    )
    state2, m2 = jax.jit(bundle2.step_fn)(state_r, sharded, rng, aux_r)

    # Params and method-owned extra state first (a flipped discrete gate —
    # e.g. ScribbleVC's is-class-max memory masking — would be O(1) here),
    # then the loss on a RELATIVE tolerance: sharded reductions
    # reassociate f32 sums, and a masked-mean CE over 100-magnitude
    # logits legitimately drifts ~2e-5 relative (measured).
    _tree_allclose(state1.params, state2.params, atol=param_atol)
    if state1.extra is not None:
        _extra_allclose(state1.extra, state2.extra, atol=param_atol)
    l1, l2 = float(m1["total_loss"]), float(m2["total_loss"])
    assert abs(l1 - l2) / max(1.0, abs(l1)) < 1e-4, (l1, l2)
    # Gate decisions must agree EXACTLY: proto_acc_* is derived from the
    # same argmax-vs-own-class compare the memory masking uses, so any
    # reassociation-flipped gate shows up here as a 1/ncls jump.
    for key in ("proto_acc_conv", "proto_acc_tran"):
        if key in m1:
            assert float(m1[key]) == float(m2[key]), (
                key, float(m1[key]), float(m2[key])
            )
    return bundle2, state2, mesh


# per-method param tolerance: ~2.2x the optimizer lr for Adam-family
# methods (sign-flip amplification, see _run_parity), 1e-4 for SGD.
PARAM_ATOL = {"scribblevc": 1.2e-3, "deep_adversarial": 3e-4}


@pytest.mark.parametrize("method", FAST_METHODS)
def test_data_parallel_step_matches_single_device(method):
    _run_parity(method, PARAM_ATOL.get(method, 1e-4))


@pytest.mark.slow
@pytest.mark.parametrize("method", SLOW_METHODS)
def test_data_parallel_step_matches_single_device_slow(method):
    _run_parity(method, PARAM_ATOL.get(method, 1e-4))


@pytest.mark.slow
def test_scribblevc_class_memory_parity_on_mesh():
    """The class-representation memory branch (active after epoch 4) must
    produce the same prototypes and gate decisions on the mesh: its
    batch-mean einsums are sharded reductions feeding discrete
    is-class-max/sigmoid gates (ADVICE round-2). Advancing state.step past
    5 epochs exercises the branch the default step-0 test never reaches;
    hist_conv/hist_tran parity (checked inside _run_parity via
    state.extra) is the gate-flip detector."""
    cfg = _cfg("scribblevc")
    steps_per_epoch = max(cfg.data_limit // cfg.batch_size, 1)
    bundle, state, mesh = _run_parity(
        "scribblevc", PARAM_ATOL["scribblevc"],
        advance_step=6 * steps_per_epoch,
    )
    init = np.asarray(
        jax.device_get(state.extra["class_memory"]["initialized"])
    )
    assert float(init) == 1.0, "memory branch did not run"


def test_s2l_refresh_on_mesh():
    """S2L's full-set EMA refresh sweep must run against a replicated state
    on the mesh (regression: xs staging was single-device placement)."""
    from wsl4mis_tpu.engine.methods.s2l import make_refresh
    from wsl4mis_tpu.data.acdc import AcdcSliceDataset

    cfg = _cfg("s2l")
    bundle = get_method("s2l").build(cfg)
    mesh = make_mesh()
    state_r = replicate_tree(mesh, bundle.state)

    train = AcdcSliceDataset(
        base_dir=cfg.root_path, fold=cfg.fold, sup_type="scribble",
        patch_size=cfg.patch_size, limit=cfg.data_limit,
    )
    refresh_single = make_refresh(cfg, train.images, refresh_bs=8)
    refresh_mesh = make_refresh(cfg, train.images, refresh_bs=8)

    out1 = refresh_single(bundle.state)
    out2 = refresh_mesh(state_r)
    _tree_allclose(out1.extra, out2.extra, atol=1e-6)
    assert float(np.abs(np.asarray(out2.extra["weight"])).max()) > 0
