"""End-to-end offline inference CLI test (slow)."""

import os

import numpy as np
import pytest

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.eval.infer import InferenceConfig, inference_fold
from wsl4mis_tpu.utils.checkpoint import save_model_checkpoint


@pytest.mark.slow
def test_inference_fold_end_to_end(tmp_path, acdc_root):
    cfg = TrainConfig(
        method="fully_supervised", sup_type="label", fold="fold1",
        batch_size=4, patch_size=(256, 256), compute_dtype="float32",
        data_limit=8,
    )
    bundle = get_method(cfg.method).build(cfg)
    snapshot = tmp_path / "ACDC_fold1" / "label"
    os.makedirs(snapshot)
    save_model_checkpoint(str(snapshot / "iter_60000.pth"), bundle.state)

    icfg = InferenceConfig(
        exp="ACDC", fold="fold1", sup_type="label", model="unet",
        snapshot_root=str(tmp_path), compute_dtype="float32",
        data_limit=2, save_predictions=True,
    )
    avg = inference_fold(icfg, "fold1")
    assert avg.shape == (3, 3)
    assert np.isfinite(avg).all()
    pred_dir = snapshot / "unet_predictions"
    files = sorted(os.listdir(pred_dir))
    assert any(f.endswith("_pred.nii.gz") for f in files)

    # written NIfTI round-trips through the reader
    from wsl4mis_tpu.data.nifti import read_nifti

    sample = next(f for f in files if f.endswith("_pred.nii.gz"))
    img = read_nifti(str(pred_dir / sample))
    assert img.array_zyx.ndim == 3
