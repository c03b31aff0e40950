"""Batched whole-val-set inference (VolumePredictor.predict_volumes) must
be bit-identical per volume to the per-volume path, for mixed native
shapes/depths, and evaluate_fold must route through it by default."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wsl4mis_tpu.eval.val2d import VolumePredictor, evaluate_fold


class TinyNet(nn.Module):
    classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.classes, (3, 3))(x)


def _setup():
    model = TinyNet()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    pred = VolumePredictor(model, patch_size=(32, 32), bucket=4)
    rng = np.random.RandomState(0)
    # mixed depths (crossing the chunk boundary via many volumes) and
    # mixed native resolutions (exercises zoom + zoom-back)
    vols = [
        rng.rand(d, h, w).astype(np.float32)
        for d, h, w in [(3, 32, 32), (7, 40, 28), (5, 32, 32), (9, 24, 24),
                        (4, 32, 40), (6, 32, 32), (11, 48, 48), (2, 32, 32)]
    ]
    return pred, variables, vols, rng


def test_batched_matches_per_volume():
    pred, variables, vols, _ = _setup()
    batched = pred.predict_volumes(variables, vols)
    for vol, b in zip(vols, batched):
        single = pred.predict_volume(variables, vol)
        np.testing.assert_array_equal(b, single)
        assert b.shape == vol.shape


def test_evaluate_fold_batched_matches_loop():
    pred, variables, vols, rng = _setup()
    volumes = [
        {"image": v, "label": rng.randint(0, 4, size=v.shape)}
        for v in vols
    ]
    batched = evaluate_fold(pred, variables, volumes, classes=4)
    os.environ["WSL4MIS_BATCHED_VAL"] = "0"
    try:
        looped = evaluate_fold(pred, variables, volumes, classes=4)
    finally:
        del os.environ["WSL4MIS_BATCHED_VAL"]
    np.testing.assert_allclose(batched, looped, rtol=0, atol=0)


def test_vol_cache_hit_and_miss():
    pred, variables, vols, rng = _setup()
    first = pred.predict_volumes(variables, vols)
    assert hasattr(pred, "_vol_cache")
    chunks_before = pred._vol_cache[2]
    second = pred.predict_volumes(variables, list(vols))  # same arrays
    assert pred._vol_cache[2] is chunks_before  # cache hit, no re-upload
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    other = [rng.rand(4, 32, 32).astype(np.float32) for _ in range(3)]
    out = pred.predict_volumes(variables, other)  # miss: rebuilt cache
    assert pred._vol_cache[2] is not chunks_before
    for v, o in zip(other, out):
        np.testing.assert_array_equal(o, pred.predict_volume(variables, v))


def test_vol_cache_tail_swap_is_a_miss():
    """VERDICT r4 weak #5: a val set sharing the first volume object and
    the length with the cached one but differing in the tail must NOT be
    served stale predictions — the key covers every volume identity."""
    pred, variables, vols, rng = _setup()
    stale = pred.predict_volumes(variables, vols)
    chunks_before = pred._vol_cache[2]
    swapped = list(vols)
    swapped[-1] = rng.rand(*vols[-1].shape).astype(np.float32)
    fresh = pred.predict_volumes(variables, swapped)
    assert pred._vol_cache[2] is not chunks_before  # cache rebuilt
    np.testing.assert_array_equal(
        fresh[-1], pred.predict_volume(variables, swapped[-1])
    )
    for a, b in zip(stale[:-1], fresh[:-1]):
        np.testing.assert_array_equal(a, b)
