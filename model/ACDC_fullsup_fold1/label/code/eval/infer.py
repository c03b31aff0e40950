"""Offline test CLI core — the reference's test_2D_fully.py rebuilt.

Parity (/root/reference/code/test_2D_fully.py:83-177):
  * fold sweep over the held-out 20 patients' volumes;
  * batched slice inference (zoom->forward->argmax->zoom back; the slice
    loop is replaced by the batched VolumePredictor);
  * per-class Dice / HD95 / ASD with native voxel spacing, where spacing
    is read from the original NIfTI when available
    (../data/ACDC_training/{case}.nii.gz) and otherwise falls back to a
    configurable default with a warning (the raw NIfTI files are not
    bundled with the processed H5 data);
  * optional prediction/image/label NIfTI export via the built-in
    NIfTI writer;
  * prints per-fold averages and the 5-fold mean.

Works for single- and multi-output models alike (the first output is the
main segmentation head, matching test_2D_fully_sps.py:97-101).
"""

from __future__ import annotations

import logging
import os
import shutil
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..data.acdc import AcdcVolumeDataset, default_acdc_root
from ..data.nifti import read_spacing, write_nifti
from ..models import init_model, net_factory
from ..utils.checkpoint import load_checkpoint
from .metrics import calculate_metric_percase_spacing
from .val2d import VolumePredictor


@dataclass
class InferenceConfig:
    root_path: str | None = None
    exp: str = "ACDC"
    model: str = "unet"
    fold: str = "fold1"
    sup_type: str = "scribble"
    num_classes: int = 4
    snapshot_root: str = "model"
    checkpoint: str = "iter_60000.pth"
    raw_data_path: str | None = None        # dir with {case}.nii.gz
    default_spacing: tuple = (1.25, 1.25, 10.0)  # (sx, sy, sz) fallback
    save_predictions: bool = True
    compute_dtype: str = "bfloat16"
    folds: tuple = ("fold1", "fold2", "fold3", "fold4", "fold5")
    data_limit: int | None = None


def _load_variables(cfg: InferenceConfig, fold: str):
    snapshot = os.path.join(
        cfg.snapshot_root, f"{cfg.exp}_{fold}", cfg.sup_type
    )
    path = os.path.join(snapshot, cfg.checkpoint)
    if not os.path.exists(path):
        fallback = os.path.join(snapshot, f"{cfg.model}_best_model.pth")
        if os.path.exists(fallback):
            logging.warning("%s missing; using %s", path, fallback)
            path = fallback
        else:
            raise FileNotFoundError(f"no checkpoint at {path} or {fallback}")
    restored = load_checkpoint(path)
    print(f"init weight from {path}")
    return {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }, snapshot


def _case_spacing(cfg: InferenceConfig, case: str) -> tuple:
    """(sz, sy, sx) ordering used for the (z, y, x) voxel arrays, matching
    the reference's (spacing[2], spacing[0], spacing[1]) permutation."""
    raw_dir = cfg.raw_data_path
    if raw_dir is None:
        raw_dir = os.path.join(
            os.path.dirname(cfg.root_path or default_acdc_root()),
            "ACDC_training",
        )
    nii = os.path.join(raw_dir, f"{case}.nii.gz")
    if os.path.exists(nii):
        sx, sy, sz = read_spacing(nii)
    else:
        sx, sy, sz = cfg.default_spacing
        logging.warning(
            "no raw NIfTI for %s; using default spacing %s", case,
            cfg.default_spacing,
        )
    return (sz, sx, sy)


def inference_fold(cfg: InferenceConfig, fold: str) -> np.ndarray:
    """Mean (3, 3) [dice, hd95, asd] per foreground class over the fold."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]
    model = net_factory(cfg.model, cfg.num_classes, dtype=dtype)
    variables, snapshot = _load_variables(cfg, fold)
    # sanity-init so missing keys fail loudly before the fold loop
    init_model(model, __import__("jax").random.key(0), (1, 256, 256, 1))
    predictor = VolumePredictor(model, (256, 256))

    test_save_path = os.path.join(snapshot, f"{cfg.model}_predictions")
    if cfg.save_predictions:
        if os.path.exists(test_save_path):
            shutil.rmtree(test_save_path)
        os.makedirs(test_save_path)

    volumes = AcdcVolumeDataset(
        base_dir=cfg.root_path, fold=fold, limit=cfg.data_limit
    )
    totals = np.zeros((cfg.num_classes - 1, 3), np.float64)
    for vol in volumes:
        case = vol["case"]
        prediction = predictor.predict_volume(variables, vol["image"])
        spacing = _case_spacing(cfg, case)
        for i in range(1, cfg.num_classes):
            totals[i - 1] += calculate_metric_percase_spacing(
                prediction == i, vol["label"] == i, spacing
            )
        if cfg.save_predictions:
            sx_sy_sz = (spacing[1], spacing[2], spacing[0])
            write_nifti(
                os.path.join(test_save_path, f"{case}_pred.nii.gz"),
                prediction.astype(np.float32), sx_sy_sz,
            )
            write_nifti(
                os.path.join(test_save_path, f"{case}_img.nii.gz"),
                vol["image"].astype(np.float32), sx_sy_sz,
            )
            write_nifti(
                os.path.join(test_save_path, f"{case}_gt.nii.gz"),
                vol["label"].astype(np.float32), sx_sy_sz,
            )
    avg = totals / len(volumes)
    print(avg)
    print(avg.mean(axis=0))
    return avg


def run_inference(cfg: InferenceConfig) -> float:
    """Fold sweep; returns the mean foreground Dice over all folds
    (test_2D_fully.py:168-177)."""
    total = 0.0
    for fold in cfg.folds:
        print(f"Inference {fold}")
        avg = inference_fold(cfg, fold)
        total += float(avg.mean(axis=0)[0])
    mean_dice = total / len(cfg.folds)
    print(mean_dice)
    return mean_dice
