import numpy as np
import pytest

from wsl4mis_tpu.data import (
    ALL_CASES,
    AcdcSliceDataset,
    AcdcVolumeDataset,
    batch_iterator,
    fold_ids,
    labeled_patient_ids,
)
from wsl4mis_tpu.data.acdc import _nearest_zoom2d


def test_fold_ids_partition():
    for k in range(1, 6):
        train, test = fold_ids(f"fold{k}")
        assert len(train) == 80 and len(test) == 20
        assert set(train) | set(test) == set(ALL_CASES)
        assert not set(train) & set(test)
    # fold1 holds out patients 1..20 (dataset_semi.py:64-65)
    _, test1 = fold_ids("fold1")
    assert test1[0] == "patient001" and test1[-1] == "patient020"
    with pytest.raises(KeyError):
        fold_ids("fold6")


def test_labeled_split():
    labeled, unlabeled = labeled_patient_ids("fold1")
    assert all(int(c[-3:]) % 10 == 0 for c in labeled)
    assert len(labeled) + len(unlabeled) == 80


def test_nearest_zoom_matches_scipy(rng):
    from scipy.ndimage import zoom

    for shape in [(256, 216), (154, 224), (256, 256), (10, 7)]:
        a = rng.rand(*shape).astype(np.float32)
        ref = zoom(a, (256 / shape[0], 256 / shape[1]), order=0)
        assert np.array_equal(_nearest_zoom2d(a, (256, 256)), ref)


def test_slice_dataset_shapes(acdc_root):
    ds = AcdcSliceDataset(fold="fold1", sup_type="scribble", limit=24)
    assert ds.images.shape == (24, 256, 256)
    assert ds.images.dtype == np.float32
    assert ds.labels.dtype == np.int32
    # scribble labels live in {0..4}
    assert set(np.unique(ds.labels)) <= {0, 1, 2, 3, 4}
    assert ds.has_ignore_class
    # fold1 train excludes patients 1..20
    assert all(int(c[-3:]) > 20 for c in ds.case_ids)


def test_dense_dataset_no_ignore(acdc_root):
    ds = AcdcSliceDataset(fold="fold1", sup_type="label", limit=24)
    assert set(np.unique(ds.labels)) <= {0, 1, 2, 3}


def test_volume_dataset(acdc_root):
    ds = AcdcVolumeDataset(fold="fold1", limit=3)
    assert len(ds) == 3
    vol = ds.volumes[0]
    assert vol["image"].ndim == 3
    assert vol["image"].shape == vol["label"].shape
    assert vol["case"].startswith("patient0")


def test_batch_iterator_determinism(acdc_root):
    ds = AcdcSliceDataset(fold="fold1", sup_type="label", limit=16)
    a = batch_iterator(ds, 4, seed=7, include_index=True)
    b = batch_iterator(ds, 4, seed=7, include_index=True)
    for _ in range(6):
        ba, bb = next(a), next(b)
        assert np.array_equal(ba["index"], bb["index"])
        assert ba["image"].shape == (4, 256, 256)
