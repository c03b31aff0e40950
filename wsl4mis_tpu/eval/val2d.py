"""Volume-wise validation: batched slice inference + 3D per-class metrics.

Reference behavior (/root/reference/code/val_2D.py:18-50): for each slice of
a volume, order-0 zoom to 256x256, forward, argmax, order-0 zoom back to the
native resolution; then per-class (dice, hd95) against the dense 3D label.

TPU-first redesign: the reference runs one slice per forward pass with a
host sync per slice; here all slices of a volume are zoomed on the host in
one vectorized gather, stacked, padded to a depth bucket (so jit compiles a
handful of shapes, not one per volume), and run through the network in a
single device call. Metrics stay on host (scipy EDT).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.acdc import _nearest_zoom2d
from .metrics import calculate_metric_percase, calculate_metric_percase_nan


def _zoom_stack(volume: np.ndarray, out_hw) -> np.ndarray:
    """Order-0 zoom of every slice of (D, H, W) to out_hw via one gather."""
    d, h, w = volume.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return volume
    ri = np.clip(
        np.floor(np.arange(oh) * ((h - 1) / (oh - 1)) + 0.5).astype(np.int64),
        0,
        h - 1,
    )
    ci = np.clip(
        np.floor(np.arange(ow) * ((w - 1) / (ow - 1)) + 0.5).astype(np.int64),
        0,
        w - 1,
    )
    return volume[:, ri[:, None], ci[None, :]]


class VolumePredictor:
    """Jitted whole-volume slice-stack inference.

    Args:
      model: a linen module whose __call__ returns logits or a tuple whose
        first element is the main logits (matches test_single_volume_cct,
        val_2D.py:90-110).
      patch_size: network input resolution.
      bucket: depth padding quantum — volumes are padded to the next
        multiple so jit sees few distinct shapes.
    """

    def __init__(self, model, patch_size=(256, 256), bucket: int = 8,
                 decision_fn=None, apply_kwargs=None):
        """decision_fn(outputs) -> (B, H, W) int class map; defaults to
        argmax of the first output head. apply_kwargs are forwarded to
        model.apply (e.g. ScribbleVC's use_class_rep)."""
        self.model = model
        self.patch_size = tuple(patch_size)
        self.bucket = bucket
        apply_kwargs = apply_kwargs or {}

        def default_decision(out):
            if isinstance(out, (tuple, list)):
                out = out[0]
            return jnp.argmax(out, axis=-1).astype(jnp.int32)

        decide = decision_fn or default_decision

        def fwd(variables, x):
            out = model.apply(variables, x, train=False, **apply_kwargs)
            return decide(out).astype(jnp.int32)

        self._fwd = jax.jit(fwd)
        self._fwd_i8 = jax.jit(
            lambda variables, x: fwd(variables, x).astype(jnp.int8)
        )

    def predict_volume(self, variables, image: np.ndarray) -> np.ndarray:
        """image: (D, H, W) float32 -> (D, H, W) int32 prediction."""
        d, h, w = image.shape
        zoomed = _zoom_stack(image.astype(np.float32), self.patch_size)
        pad = (-d) % self.bucket
        if pad:
            zoomed = np.concatenate(
                [zoomed, np.zeros((pad, *self.patch_size), np.float32)], axis=0
            )
        x = jnp.asarray(zoomed[..., None])  # (D', H, W, 1)
        pred = np.asarray(jax.device_get(self._fwd(variables, x)))[:d]
        return self._zoom_back(pred, h, w).astype(np.int32)

    def _zoom_back(self, pred, h, w):
        # zoom back to native resolution (order-0), one gather for the stack
        if (h, w) != self.patch_size:
            ri = np.clip(
                np.floor(
                    np.arange(h) * ((self.patch_size[0] - 1) / (h - 1)) + 0.5
                ).astype(np.int64),
                0,
                self.patch_size[0] - 1,
            )
            ci = np.clip(
                np.floor(
                    np.arange(w) * ((self.patch_size[1] - 1) / (w - 1)) + 0.5
                ).astype(np.int64),
                0,
                self.patch_size[1] - 1,
            )
            pred = pred[:, ri[:, None], ci[None, :]]
        return pred.astype(np.int32)

    def predict_volumes(self, variables, images) -> list:
        """Whole-val-set inference in CHUNK-slice device calls.

        The per-volume path pays one tunnel round trip (25-75 ms RTT on
        this backend) + dispatch per volume; at 20 volumes every 200
        iterations that made validation ~80% of DMPLS wall-clock. Here
        every volume's zoomed/padded stack is concatenated, padded to a
        multiple of one fixed chunk size, and run in identical-shape
        calls — one compiled program, ~4 round trips for a whole fold.
        Predictions travel back as int8 (classes < 128) to quarter the
        download. A val set is immutable across a training run, so the
        zoomed/padded/chunked device arrays are cached after the first
        call — keyed on the identities of ALL volumes (the cache keeps
        strong refs to the volume list, so no id can be recycled for a
        different array) — and later vals upload nothing. The cached
        chunks occupy device HBM for the lifetime of the predictor
        (fold1 val set ≈ 90 MB at 256², f32), alongside the train step.
        Per-volume results are bit-identical to predict_volume (same
        program on the same padded slices; tested in
        tests/test_val2d_batched.py).
        """
        chunk = max(self.bucket, 64)
        cached = getattr(self, "_vol_cache", None)
        key = tuple(id(im) for im in images)
        if cached is not None and cached[0] == key:
            _, _, chunks, depths, shapes = cached
        else:
            zoomed, depths, shapes = [], [], []
            for im in images:
                im = np.asarray(im)
                z = _zoom_stack(im.astype(np.float32), self.patch_size)
                pad = (-z.shape[0]) % self.bucket
                if pad:
                    z = np.concatenate(
                        [z, np.zeros((pad, *self.patch_size), np.float32)],
                        axis=0,
                    )
                zoomed.append(z)
                depths.append((im.shape[0], z.shape[0]))
                shapes.append(im.shape[1:])
            big = np.concatenate(zoomed, axis=0)
            total_pad = (-big.shape[0]) % chunk
            if total_pad:
                big = np.concatenate(
                    [big, np.zeros((total_pad, *self.patch_size), np.float32)],
                    axis=0,
                )
            chunks = [
                jax.device_put(jnp.asarray(big[i:i + chunk][..., None]))
                for i in range(0, big.shape[0], chunk)
            ]
            # hold the volume list itself: keeps every id() live so the
            # key tuple cannot alias a later, different val set
            self._vol_cache = (key, list(images), chunks, depths, shapes)
        parts = [
            np.asarray(jax.device_get(self._fwd_i8(variables, x)))
            for x in chunks
        ]
        flat = np.concatenate(parts, axis=0)
        preds, off = [], 0
        for (h, w), (d, dp) in zip(shapes, depths):
            preds.append(
                self._zoom_back(flat[off:off + d].astype(np.int32), h, w)
                .astype(np.int32)
            )
            off += dp
        return preds


def test_single_volume(image, label, predictor, variables, classes: int,
                       metric_fn=calculate_metric_percase):
    """Per-class [dice, hd95] for one volume (val_2D.py:18-50 parity)."""
    prediction = predictor.predict_volume(variables, np.asarray(image))
    label = np.asarray(label)
    return [metric_fn(prediction == i, label == i) for i in range(1, classes)]


def evaluate_fold(predictor, variables, volumes, classes: int,
                  nan_aware: bool = False) -> np.ndarray:
    """Mean (classes-1, 2) [dice, hd95] over a volume dataset.

    Matches the train-loop validation block
    (train_fully_supervised_2D.py:132-150). With ``nan_aware`` the
    ScribbleVC conventions apply: absent classes score NaN per volume and
    the aggregation is a NaN-mean (train_ACDC_scribblevc.py:273-288).
    """
    metric_fn = calculate_metric_percase_nan if nan_aware else (
        calculate_metric_percase)
    if os.environ.get("WSL4MIS_BATCHED_VAL", "1") != "0" and hasattr(
            predictor, "predict_volumes"):
        preds = predictor.predict_volumes(
            variables, [vol["image"] for vol in volumes]
        )
        per_volume = [
            [
                metric_fn(pred == i, np.asarray(vol["label"]) == i)
                for i in range(1, classes)
            ]
            for pred, vol in zip(preds, volumes)
        ]
    else:
        per_volume = [
            test_single_volume(
                vol["image"], vol["label"], predictor, variables, classes,
                metric_fn=metric_fn,
            )
            for vol in volumes
        ]
    arr = np.asarray(per_volume, np.float64)
    if nan_aware:
        with np.errstate(invalid="ignore"):
            return np.nanmean(arr, axis=0)
    return arr.mean(axis=0)
