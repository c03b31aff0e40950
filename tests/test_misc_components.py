import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.data.loader import prefetch
from wsl4mis_tpu.models.discriminator import FC3DDiscriminator
from wsl4mis_tpu.models.legacy_gan import (
    NLayerDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    gan_loss,
    get_schedule,
    select_initializer,
)
from wsl4mis_tpu.utils.feature_extractor import extract_features
from wsl4mis_tpu.utils.seg_utils import compute_sdf, decode_segmap, post_processing


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(20)), size=3)) == list(range(20))


def test_fc3d_discriminator_shape():
    disc = FC3DDiscriminator(num_classes=2, dtype=jnp.float32)
    seg = jnp.zeros((2, 96, 96, 96, 2))
    img = jnp.zeros((2, 96, 96, 96, 1))
    rngs = {"params": jax.random.key(0), "feature_perturb": jax.random.key(1)}
    variables = disc.init(rngs, seg, img, train=False)
    out = disc.apply(variables, seg, img, train=False)
    assert out.shape == (2, 2)


def test_legacy_gan_shapes():
    x = jnp.zeros((1, 64, 64, 1))
    g = ResnetGenerator(out_channels=1, ngf=8, n_blocks=2)
    vg = g.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    assert g.apply(vg, x).shape == (1, 64, 64, 1)

    u = UnetGenerator(out_channels=1, num_downs=4, ngf=8)
    vu = u.init({"params": jax.random.key(0)}, x)
    assert u.apply(vu, x).shape[1:3] == (64, 64)

    d = NLayerDiscriminator(ndf=8)
    vd = d.init({"params": jax.random.key(0)}, x)
    out = d.apply(vd, x)
    assert out.shape[-1] == 1 and out.ndim == 4


def test_gan_loss_values():
    logits = jnp.zeros((2, 4, 4, 1))
    assert float(gan_loss(logits, True, use_lsgan=True)) == 1.0
    assert float(gan_loss(logits, False, use_lsgan=True)) == 0.0
    bce = float(gan_loss(logits, True, use_lsgan=False))
    assert abs(bce - np.log(2)) < 1e-6


def test_get_schedule():
    s = get_schedule("lambda", 1.0, niter=10, niter_decay=10)
    assert float(s(0)) == 1.0
    assert float(s(9)) == 1.0
    assert float(s(20)) < 0.2
    step = get_schedule("step", 1.0, lr_decay_iters=5)
    assert abs(float(step(5)) - 0.1) < 1e-6
    with pytest.raises(NotImplementedError):
        get_schedule("plateau", 1.0)
    with pytest.raises(NotImplementedError):
        select_initializer("bogus")


def test_extract_features():
    from wsl4mis_tpu.models import init_model, net_factory

    model = net_factory("unet", 4, dtype=jnp.float32)
    variables = init_model(model, jax.random.key(0), (1, 32, 32, 1))
    x = jnp.zeros((1, 32, 32, 1))
    out, feats = extract_features(model, variables, x, train=False)
    assert out.shape == (1, 32, 32, 4)
    assert len(feats) > 5


def test_seg_utils(rng):
    lab = rng.randint(0, 4, (16, 16))
    rgb = decode_segmap(lab)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8

    pred = np.zeros((16, 16), int)
    pred[1:4, 1:4] = 1     # big component
    pred[10, 10] = 1       # speck -> removed
    post = post_processing(pred)
    assert post[2, 2] == 1 and post[10, 10] == 0

    mask = np.zeros((16, 16), bool)
    mask[4:12, 4:12] = True
    sdf = compute_sdf(mask)
    assert sdf.min() >= -1 and sdf.max() <= 1
    assert sdf[8, 8] < 0 and sdf[0, 0] > 0


def test_cross_entropy2d_vs_torch(rng):
    import torch

    from wsl4mis_tpu.utils.seg_utils import cross_entropy2d

    logit = rng.randn(2, 8, 8, 4).astype(np.float32)
    target = rng.randint(0, 4, (2, 8, 8))
    target[0, :2] = 255  # ignored pixels
    ours = cross_entropy2d(logit, target, ignore_index=255)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logit.transpose(0, 3, 1, 2)),
        torch.tensor(target, dtype=torch.long),
        ignore_index=255, reduction="sum",
    ).item() / (8 * 8) / 2  # size_average then batch_average
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    w = [1.0, 2.0, 0.5, 1.5]
    ours_w = cross_entropy2d(logit, target, ignore_index=255, weight=w)
    ref_w = torch.nn.functional.cross_entropy(
        torch.tensor(logit.transpose(0, 3, 1, 2)),
        torch.tensor(target, dtype=torch.long),
        weight=torch.tensor(w), ignore_index=255, reduction="sum",
    ).item() / (8 * 8) / 2
    np.testing.assert_allclose(ours_w, ref_w, rtol=1e-5)


def test_get_mc_dice(rng):
    from wsl4mis_tpu.utils.seg_utils import get_mc_dice

    pred = rng.randint(0, 3, (2, 8, 8))
    gt = rng.randint(0, 3, (2, 8, 8))
    d = get_mc_dice(pred, gt, num=3)
    assert d.shape == (2,)
    # exact-match dice with the reference's 1.0 smooth
    full = np.ones((1, 4, 4), int)
    d2 = get_mc_dice(full, full, num=2)
    np.testing.assert_allclose(d2[0], 2.0 * 16 / (1.0 + 32))
