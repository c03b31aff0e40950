"""MSCMR and Prostate ScribbleVC data pipelines on synthetic H5 fixtures.

VERDICT round-1 items 4/10: the MSCMRfold split + driver and the Prostate
dataset variant (on-the-fly random-walker supervision) had no CI coverage.
These tests synthesize dataset-shaped H5 trees (the reference data is not
bundled) and exercise the full build + one train step.

Reference shapes: dataset_scribblevc.py:368-439 (MSCMRDataSets: 2-digit
patient ids, MSCMR_training_slices/volumes dirs), :39-165 (Prostate
BaseDataSets: random_walker sup_type resolved on the fly from scribbles).
"""

import h5py
import jax
import numpy as np
import pytest

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method


def _write_slice(path, rng, num_classes=4, size=70):
    img = rng.random((size, size)).astype(np.float32)
    lab = rng.integers(0, num_classes, (size, size)).astype(np.uint8)
    scr = lab.astype(np.uint16).copy()
    # scribble convention: most pixels unannotated (class 4), thin strokes
    # keep their class; guarantee every class has a few seed pixels.
    mask = rng.random((size, size)) > 0.02
    scr[mask] = 4
    for c in range(num_classes):
        ys, xs = np.where(lab == c)
        if len(ys):
            keep = slice(0, max(3, len(ys) // 50))
            scr[ys[keep], xs[keep]] = c
    with h5py.File(path, "w") as f:
        f.create_dataset("image", data=img)
        f.create_dataset("label", data=lab)
        f.create_dataset("scribble", data=scr)


def _write_volume(path, rng, num_classes=4, size=70, depth=3):
    img = rng.random((depth, size, size)).astype(np.float32)
    lab = rng.integers(0, num_classes, (depth, size, size)).astype(np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("image", data=img)
        f.create_dataset("label", data=lab)


def _make_tree(root, prefix, train_cases, val_cases, slices_per_case=4,
               num_classes=4):
    sdir = root / f"{prefix}_training_slices"
    vdir = root / f"{prefix}_training_volumes"
    sdir.mkdir()
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for case in train_cases:
        for i in range(slices_per_case):
            _write_slice(sdir / f"{case}_slice_{i}.h5", rng, num_classes)
    for case in val_cases:
        # bundled volume files carry a frame suffix (patient001_frame01.h5)
        _write_volume(vdir / f"{case}_frame01.h5", rng, num_classes)


def _one_step(cfg):
    bundle = get_method("scribblevc").build(cfg)
    step = jax.jit(bundle.step_fn)
    state = bundle.state
    batch = next(bundle.data_iter)
    state, metrics = step(state, batch, jax.random.key(0), bundle.aux)
    return bundle, state, metrics


@pytest.mark.slow
def test_mscmr_fixture_one_step(tmp_path):
    """MSCMRfold: 2-digit train ids from the fixed split, fixed val set
    (dataset_scribblevc.py:406-410), MSCMR_* dirnames."""
    # patient13/patient14 are in the MSCMR train list, patient01 in val
    _make_tree(tmp_path, "MSCMR", ["patient13", "patient14"], ["patient01"])
    # a train-split patient that must NOT be picked up (not in the split)
    _write_slice(
        tmp_path / "MSCMR_training_slices" / "patient99_slice_0.h5",
        np.random.default_rng(1),
    )
    cfg = TrainConfig(
        method="scribblevc", model="scribblevc", fold="MSCMRfold",
        sup_type="scribble", root_path=str(tmp_path), batch_size=4,
        max_iterations=1, patch_size=(64, 64), compute_dtype="float32",
        thr_iter=0,
    )
    bundle, state, metrics = _one_step(cfg)
    # patient99 excluded by the fixed split: 2 patients x 4 slices staged
    assert bundle.aux["images"].shape[0] == 8
    assert np.isfinite(float(metrics["total_loss"]))
    assert [v["case"] for v in bundle.val_volumes] == ["patient01_frame01"]
    assert int(state.step) == 1


@pytest.mark.slow
def test_prostate_fixture_rw_one_step(tmp_path):
    """Prostate variant: 3 classes, sup_type=random_walker resolved on the
    fly via the prostate generator (dataset_scribblevc.py:20-36, 353-356)."""
    # prostate_fold2 trains on patients 1-20 and 41-80, tests 21-40
    _make_tree(tmp_path, "Prostate", ["patient001"], ["patient021"],
               num_classes=3)
    cfg = TrainConfig(
        method="scribblevc", model="scribblevc", fold="prostate_fold2",
        sup_type="random_walker", root_path=str(tmp_path), batch_size=4,
        num_classes=3, max_iterations=1, patch_size=(64, 64),
        compute_dtype="float32", thr_iter=0,
    )
    bundle, state, metrics = _one_step(cfg)
    assert np.isfinite(float(metrics["total_loss"]))
    # the on-the-fly labels live in {0,1,2} (never the scribble ignore id)
    labs = np.asarray(
        bundle.aux["labels"] if bundle.aux is not None else 0
    )
    assert labs.max() <= 2
