"""Trainer-loop behaviors: K-step fusion, cadence rounding, resume flag."""

import os

import pytest

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.engine.trainer import Trainer


@pytest.mark.slow
def test_steps_per_call_loop(tmp_path):
    cfg = TrainConfig(
        method="fully_supervised", sup_type="label", batch_size=4,
        max_iterations=8, patch_size=(64, 64), val_every=8, ckpt_every=8,
        compute_dtype="float32", data_limit=16, log_every=4,
        steps_per_call=4, snapshot_root=str(tmp_path), num_devices=1,
    )
    bundle = get_method(cfg.method).build(cfg)
    trainer = Trainer(cfg, bundle, use_tensorboard=False)
    assert trainer.multi == 4
    assert trainer.val_every == 8 and trainer.log_every == 4
    out = trainer.train()
    assert out == "Training Finished!"
    assert int(trainer.state.step) == 8
    snap = cfg.snapshot_path
    assert os.path.exists(os.path.join(snap, "latest_full.ckpt"))


class _RecordingWriter:
    def __init__(self):
        self.scalars = []
        self.images = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, step))

    def add_image(self, tag, img, step):
        import numpy as np

        self.images.append((tag, np.asarray(img).shape, str(img.dtype), step))

    def close(self):
        pass


@pytest.mark.slow
def test_tensorboard_image_triptych(tmp_path):
    """train/Image|Prediction|GroundTruth logged every 20 iterations under
    the reference tags (train_fully_supervised_2D.py:121-130)."""
    cfg = TrainConfig(
        method="pce", sup_type="scribble", batch_size=4,
        max_iterations=20, patch_size=(64, 64), val_every=1000,
        ckpt_every=1000, compute_dtype="float32", data_limit=16,
        log_every=20, snapshot_root=str(tmp_path), num_devices=1,
    )
    bundle = get_method(cfg.method).build(cfg)
    trainer = Trainer(cfg, bundle, use_tensorboard=False)
    writer = _RecordingWriter()
    trainer.writer = writer
    trainer.train()
    tags = {t for t, *_ in writer.images}
    assert tags == {"train/Image", "train/Prediction", "train/GroundTruth"}
    # CHW layout, normalized image float + uint8 maps scaled by 50
    img_entries = [e for e in writer.images if e[0] == "train/Image"]
    pred_entries = [e for e in writer.images if e[0] == "train/Prediction"]
    assert img_entries[0][1] == (1, 64, 64)
    assert pred_entries[0][2] == "uint8"
    assert {s for _, s in writer.scalars if s == 20}


def test_cadence_rounding(tmp_path):
    cfg = TrainConfig(
        method="fully_supervised", sup_type="label", batch_size=4,
        max_iterations=6, patch_size=(64, 64), val_every=7, ckpt_every=9,
        compute_dtype="float32", data_limit=8, log_every=1,
        steps_per_call=3, snapshot_root=str(tmp_path), num_devices=1,
    )
    bundle = get_method(cfg.method).build(cfg)
    trainer = Trainer(cfg, bundle, use_tensorboard=False)
    # cadences round down to multiples of K (min K)
    assert trainer.val_every == 6
    assert trainer.ckpt_every == 9 // 3 * 3
    assert trainer.log_every == 3
