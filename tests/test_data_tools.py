"""Tests for the data-prep toolchain: NIfTI IO, preprocessing,
random walker, scribble simulation."""

import numpy as np
import pytest

from wsl4mis_tpu.data.nifti import NiftiImage, read_nifti, read_spacing, write_nifti
from wsl4mis_tpu.data.preprocess import normalize, percentile_clip
from wsl4mis_tpu.data.random_walker import (
    pseudo_label_generator_acdc,
    random_walker,
)
from wsl4mis_tpu.data.scribble_sim import (
    generate_scribble,
    largest_components,
    zhang_suen_thin,
)


def test_nifti_roundtrip(tmp_path, rng):
    vol = (rng.rand(6, 32, 28) * 100).astype(np.float32)  # (z, y, x)
    spacing = (1.25, 1.5, 10.0)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol, spacing)
    img = read_nifti(path)
    assert np.allclose(img.array_zyx, vol)
    assert np.allclose(img.spacing, spacing)
    assert np.allclose(read_spacing(path), spacing)


def test_nifti_uncompressed_and_int(tmp_path, rng):
    vol = rng.randint(0, 4, (3, 16, 16)).astype(np.int32)
    path = str(tmp_path / "labels.nii")
    write_nifti(path, vol, (1.0, 1.0, 5.0))
    back = read_nifti(path)
    assert np.array_equal(back.array_zyx, vol)
    assert back.array_zyx.dtype == np.int32


def test_percentile_clip():
    img = np.concatenate([np.arange(990.0), np.full(10, 1e6)])
    clipped = percentile_clip(img, 0.99)
    # the outliers collapse to the 99th-percentile watershed value
    assert clipped.max() < 1e6
    assert clipped.max() >= 989.0 * 0.9
    n = normalize(clipped)
    assert n.min() == 0.0 and n.max() == 1.0 and n.dtype == np.float32


def test_random_walker_two_regions(rng):
    img = np.zeros((30, 30))
    img[:, 15:] = 1.0
    img += rng.randn(30, 30) * 0.01
    markers = np.zeros((30, 30), int)
    markers[15, 3] = 1
    markers[15, 27] = 2
    seg = random_walker(img, markers, beta=100)
    assert (seg[:, :15] == 1).mean() > 0.95
    assert (seg[:, 15:] == 2).mean() > 0.95


def test_pseudo_label_requires_all_classes():
    data = np.random.RandomState(0).rand(20, 20)
    seed = np.full((20, 20), 4, np.int32)
    seed[2, 2] = 1  # classes 2 and 3 absent
    assert (pseudo_label_generator_acdc(data, seed) == 0).all()


def test_pseudo_label_real_slice(acdc_root):
    import h5py
    import os

    path = os.path.join(
        acdc_root, "ACDC_training_slices", "patient021_frame01_slice_5.h5"
    )
    with h5py.File(path, "r") as f:
        img, scr = f["image"][:], f["scribble"][:].astype(np.int32)
    pl = pseudo_label_generator_acdc(img, scr)
    assert set(np.unique(pl)) <= {0, 1, 2, 3}
    # every scribbled foreground pixel keeps its class
    for c in (1, 2, 3):
        assert (pl[scr == c] == c).all()


def test_zhang_suen_thin_disk():
    yy, xx = np.mgrid[:31, :31]
    disk = ((yy - 15) ** 2 + (xx - 15) ** 2) <= 100
    sk = zhang_suen_thin(disk)
    assert 0 < sk.sum() < disk.sum() / 5  # much thinner than the disk
    # skeleton stays inside the object
    assert (disk[sk > 0]).all()


def test_largest_components():
    img = np.zeros((20, 20), bool)
    img[1:10, 1:10] = True    # 81 px
    img[15:18, 15:18] = True  # 9 px -> 10*9 > 81, keep both
    comps = largest_components(img)
    assert len(comps) == 2
    img2 = np.zeros((20, 20), bool)
    img2[1:12, 1:12] = True   # 121 px
    img2[18, 18] = True       # 1 px -> dropped
    assert len(largest_components(img2)) == 1


def test_generate_scribble_semantics():
    label = np.zeros((2, 48, 48), np.uint8)
    label[:, 8:40, 8:24] = 1
    label[:, 8:40, 26:42] = 2
    scr = generate_scribble(label, (1, 2), seed=0)
    present = set(np.unique(scr))
    assert present <= {0, 1, 2, 3}
    # class scribbles lie inside their regions
    assert (label[scr == 1] == 1).all()
    assert (label[scr == 2] == 2).all()
    # background scribble takes id class_num = 3
    assert (label[scr == 3] == 0).all()
