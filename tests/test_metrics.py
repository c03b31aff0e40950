"""Metric parity tests: dice/hd95/asd vs brute-force surface distances."""

import numpy as np
import pytest
from scipy import ndimage

from wsl4mis_tpu.eval import metrics


def _brute_surface_distances(a, b, spacing=None):
    """O(n^2) pairwise border-distance oracle."""
    sp = np.asarray(spacing if spacing is not None else np.ones(a.ndim))
    foot = ndimage.generate_binary_structure(a.ndim, 1)
    ab = a & ~ndimage.binary_erosion(a, foot)
    bb = b & ~ndimage.binary_erosion(b, foot)
    pa = np.argwhere(ab) * sp
    pb = np.argwhere(bb) * sp
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def _random_blob(rng, shape=(24, 24)):
    m = rng.rand(*shape) > 0.7
    m = ndimage.binary_dilation(m)
    if not m.any():
        m[shape[0] // 2, shape[1] // 2] = True
    return m


def test_dice(rng):
    a = _random_blob(rng)
    b = _random_blob(rng)
    expected = 2 * (a & b).sum() / (a.sum() + b.sum())
    assert abs(metrics.dice_coefficient(a, b) - expected) < 1e-12


@pytest.mark.parametrize("spacing", [None, (2.0, 0.5)])
def test_hd95_asd_vs_bruteforce(rng, spacing):
    for _ in range(5):
        a = _random_blob(rng)
        b = _random_blob(rng)
        dab = _brute_surface_distances(a, b, spacing)
        dba = _brute_surface_distances(b, a, spacing)
        ref_hd95 = np.percentile(np.hstack([dab, dba]), 95)
        ref_asd = dab.mean()
        assert abs(metrics.hd95(a, b, spacing) - ref_hd95) < 1e-9
        assert abs(metrics.asd(a, b, spacing) - ref_asd) < 1e-9


def test_3d_with_anisotropic_spacing(rng):
    a = rng.rand(6, 12, 12) > 0.6
    b = rng.rand(6, 12, 12) > 0.6
    a[3, 6, 6] = b[3, 6, 6] = True
    spacing = (5.0, 1.2, 1.2)  # (z, y, x) like the ACDC test CLI
    dab = _brute_surface_distances(a, b, spacing)
    dba = _brute_surface_distances(b, a, spacing)
    ref = np.percentile(np.hstack([dab, dba]), 95)
    assert abs(metrics.hd95(a, b, spacing) - ref) < 1e-9


def test_empty_pred_shortcut():
    gt = np.zeros((8, 8), bool)
    gt[2:5, 2:5] = True
    assert metrics.calculate_metric_percase(np.zeros((8, 8)), gt) == (0.0, 0.0)
    d, h, a = metrics.calculate_metric_percase_spacing(
        np.zeros((8, 8)), gt, (1.0, 1.0)
    )
    assert (d, h, a) == (0.0, 0.0, 0.0)
