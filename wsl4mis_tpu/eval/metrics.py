"""Binary segmentation metrics: Dice, HD95, ASD — medpy-parity, no medpy.

The reference evaluates with medpy.metric.binary (dc/hd95/asd,
/root/reference/code/val_2D.py:7-15, test_2D_fully.py:74-80). medpy is not
available in this environment, so the same definitions are implemented on
scipy primitives:

  * surface distances: border voxels = mask ^ binary_erosion(mask) with a
    connectivity-1 structuring element; distances = EDT of the complement
    of the *other* surface, sampled at the border voxels (this is exactly
    medpy's __surface_distances).
  * hd95 = 95th percentile of the symmetric surface-distance multiset;
  * asd(result, reference) = mean one-directional surface distance.

Empty-prediction handling follows the reference validation path: a class
with an empty prediction scores (0, 0) (val_2D.py:10-15).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def dice_coefficient(result: np.ndarray, reference: np.ndarray) -> float:
    """medpy.metric.binary.dc parity."""
    result = result.astype(bool)
    reference = reference.astype(bool)
    intersection = np.count_nonzero(result & reference)
    size_sum = np.count_nonzero(result) + np.count_nonzero(reference)
    if size_sum == 0:
        return 0.0
    return 2.0 * intersection / size_sum


def _border(mask: np.ndarray) -> np.ndarray:
    footprint = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, structure=footprint, iterations=1)
    return mask & ~eroded


def _crop_to_union(result: np.ndarray, reference: np.ndarray):
    """Crop both masks to the union bounding box + 1 voxel margin.

    Exactness: every border voxel of either mask lies inside the union
    bbox, and with the 1-voxel false margin the binary erosion (border
    extraction) and the EDT values *at border voxels* are identical to the
    full-volume computation — only the distance field outside the bbox
    (never sampled) is dropped. On 256^2 cardiac volumes this cuts the EDT
    cost ~5-20x, which dominates validation wall time on this host.
    """
    union = result | reference
    slices = ndimage.find_objects(union.astype(np.int8), max_label=1)[0]
    if slices is None:  # both empty — callers guard, but stay safe
        return result, reference
    padded = tuple(
        slice(max(s.start - 1, 0), min(s.stop + 1, dim))
        for s, dim in zip(slices, result.shape)
    )
    return result[padded], reference[padded]


def surface_distances(
    result: np.ndarray, reference: np.ndarray, voxelspacing=None
) -> np.ndarray:
    """One-directional surface distances (medpy __surface_distances parity)."""
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    result, reference = _crop_to_union(result, reference)
    if voxelspacing is not None:
        voxelspacing = np.atleast_1d(
            np.asarray(voxelspacing, dtype=np.float64)
        )
        if voxelspacing.size == 1:
            voxelspacing = np.repeat(voxelspacing, result.ndim)
    if not result.any():
        raise RuntimeError("result is empty — no surface to measure")
    if not reference.any():
        raise RuntimeError("reference is empty — no surface to measure")
    result_border = _border(result)
    reference_border = _border(reference)
    dt = ndimage.distance_transform_edt(
        ~reference_border, sampling=voxelspacing
    )
    return dt[result_border]


def hd95(result, reference, voxelspacing=None) -> float:
    """medpy.metric.binary.hd95 parity."""
    d1 = surface_distances(result, reference, voxelspacing)
    d2 = surface_distances(reference, result, voxelspacing)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def asd(result, reference, voxelspacing=None) -> float:
    """medpy.metric.binary.asd parity (one-directional mean)."""
    return float(surface_distances(result, reference, voxelspacing).mean())


def calculate_metric_percase(pred: np.ndarray, gt: np.ndarray):
    """(dice, hd95) with the reference's empty-pred shortcut (val_2D.py:7-15)."""
    pred = (pred > 0)
    gt = (gt > 0)
    if pred.sum() > 0 and gt.sum() > 0:
        return dice_coefficient(pred, gt), hd95(pred, gt)
    return 0.0, 0.0


def calculate_metric_percase_nan(pred: np.ndarray, gt: np.ndarray):
    """(dice, hd95) with the ScribbleVC NaN conventions
    (val_2D_scribblevc.py:15-28): a class absent from both gt and pred
    scores (nan, nan) so nanmean aggregation skips it; gt-absent but
    predicted scores (0, 0); present-but-missed keeps its dice with a NaN
    hd95 (no surface to measure)."""
    pred = (pred > 0)
    gt = (gt > 0)
    if gt.sum() == 0 and pred.sum() == 0:
        return np.nan, np.nan
    if gt.sum() == 0:
        return 0.0, 0.0
    dice = dice_coefficient(pred, gt)
    if pred.sum() == 0:
        return dice, np.nan
    return dice, hd95(pred, gt)


def calculate_metric_percase_spacing(pred, gt, spacing):
    """(dice, hd95, asd) with native voxel spacing (test_2D_fully.py:74-80)."""
    pred = (pred > 0)
    gt = (gt > 0)
    if pred.sum() == 0 or gt.sum() == 0:
        return 0.0, 0.0, 0.0
    return (
        dice_coefficient(pred, gt),
        hd95(pred, gt, spacing),
        asd(pred, gt, spacing),
    )
