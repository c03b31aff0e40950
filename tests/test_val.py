import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.acdc import _nearest_zoom2d
from wsl4mis_tpu.eval.val2d import VolumePredictor, evaluate_fold
from wsl4mis_tpu.models import init_model, net_factory


def _make():
    model = net_factory("unet", class_num=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 1))
    return model, variables


def test_predict_volume_matches_slice_loop(rng):
    """Batched inference must equal the reference's per-slice loop
    (val_2D.py:18-37): zoom each slice to patch, forward, argmax, zoom back."""
    model, variables = _make()
    predictor = VolumePredictor(model, patch_size=(64, 64), bucket=4)
    vol = rng.rand(5, 50, 40).astype(np.float32)

    pred = predictor.predict_volume(variables, vol)
    assert pred.shape == vol.shape

    for ind in range(vol.shape[0]):
        sl = _nearest_zoom2d(vol[ind], (64, 64))
        out = model.apply(variables, jnp.asarray(sl[None, ..., None]), train=False)
        ref = np.asarray(jnp.argmax(out, -1))[0]
        ref_back = _nearest_zoom2d(ref.astype(np.int32), (50, 40))
        assert np.array_equal(pred[ind], ref_back)


def test_predict_volume_native_patch(rng):
    model, variables = _make()
    predictor = VolumePredictor(model, patch_size=(64, 64), bucket=4)
    vol = rng.rand(3, 64, 64).astype(np.float32)
    pred = predictor.predict_volume(variables, vol)
    assert pred.shape == vol.shape


def test_evaluate_fold_shape(rng):
    model, variables = _make()
    predictor = VolumePredictor(model, patch_size=(64, 64), bucket=4)
    volumes = [
        {"case": "x", "image": rng.rand(4, 64, 64).astype(np.float32),
         "label": rng.randint(0, 4, (4, 64, 64))}
        for _ in range(2)
    ]
    m = evaluate_fold(predictor, variables, volumes, 4)
    assert m.shape == (3, 2)
    assert np.isfinite(m).all()
