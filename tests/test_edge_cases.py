"""Edge-case robustness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.augment_device import augment_batch
from wsl4mis_tpu.ops import losses
from wsl4mis_tpu.ops.gated_crf import gated_crf_loss, select_gated_crf


def test_cross_entropy_all_ignored():
    """A batch whose every pixel is the ignore class must not NaN."""
    logits = jnp.zeros((1, 4, 4, 4))
    labels = jnp.full((1, 4, 4), 4, jnp.int32)
    out = float(losses.cross_entropy(logits, labels, ignore_index=4))
    assert out == 0.0


def test_pdice_all_ignored_is_finite():
    probs = jax.nn.softmax(jnp.zeros((1, 4, 4, 4)), -1)
    labels = jnp.full((1, 4, 4), 4, jnp.int32)
    assert np.isfinite(float(losses.pdice_loss(probs, labels, 4)))


def test_select_gated_crf_cpu_is_scan():
    assert select_gated_crf() is gated_crf_loss          # CPU backend
    assert select_gated_crf("never") is gated_crf_loss


def test_augment_branch_distribution(rng):
    """~50% of samples should take the rot90+flip branch, ~25% rotate."""
    n = 400
    imgs = jnp.asarray(rng.rand(n, 8, 8).astype(np.float32))
    labs = jnp.zeros((n, 8, 8), jnp.int32)
    out_i, _ = augment_batch(jax.random.key(0), imgs, labs)
    out_i = np.asarray(out_i)
    src = np.asarray(imgs)
    identity = np.array([np.array_equal(out_i[i], src[i]) for i in range(n)])
    # identity branch has prob 1/4 (plus rot90 k=0 without flip... flip
    # always applies, so pure identity == branch 2 only)
    frac = identity.mean()
    assert 0.15 < frac < 0.35, frac


def test_gated_crf_uniform_probs_positive(rng):
    """With uniform probabilities the Potts loss stays positive & finite."""
    probs = jnp.full((1, 16, 16, 4), 0.25)
    img = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    val = float(gated_crf_loss(probs, img, radius=2))
    assert np.isfinite(val) and val > 0


def test_volume_predictor_single_slice_volume(rng):
    from wsl4mis_tpu.eval.val2d import VolumePredictor
    from wsl4mis_tpu.models import init_model, net_factory

    model = net_factory("unet", 4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 64, 64, 1))
    pred = VolumePredictor(model, (64, 64), bucket=4).predict_volume(
        variables, rng.rand(1, 50, 40).astype(np.float32)
    )
    assert pred.shape == (1, 50, 40)
