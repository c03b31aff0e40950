import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from wsl4mis_tpu.data.augment_device import (
    _rot90_flip,
    _rotate_nearest,
    augment_batch,
    augment_batch_s2l,
)
from wsl4mis_tpu.data.augment import HostRandomGenerator


def test_rotate_nearest_matches_scipy(rng):
    for trial in range(5):
        angle = rng.randint(-20, 20)
        img = rng.randint(0, 900, (64, 64)).astype(np.float32)
        ref = ndimage.rotate(
            img, angle, order=0, reshape=False, mode="constant", cval=4
        )
        got = np.asarray(
            _rotate_nearest(jnp.asarray(img), jnp.float32(angle), 4)
        )
        assert np.array_equal(got, ref), f"angle {angle}"


def test_rot90_flip_matches_numpy():
    img = np.arange(16.0).reshape(4, 4)
    for k in range(4):
        for axis in range(2):
            expected = np.flip(np.rot90(img, k), axis=axis)
            got = np.asarray(
                _rot90_flip(jnp.asarray(img), jnp.int32(k), jnp.int32(axis))
            )
            assert np.array_equal(got, expected)


def test_augment_batch_deterministic_and_valid(rng):
    imgs = rng.rand(6, 32, 32).astype(np.float32)
    labs = rng.randint(0, 5, (6, 32, 32)).astype(np.int32)
    key = jax.random.key(3)
    a1 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(labs))
    a2 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(labs))
    assert np.array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    assert np.array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
    # labels stay in the valid set
    assert set(np.unique(np.asarray(a1[1]))) <= {0, 1, 2, 3, 4}
    # different key -> (almost surely) different batch
    a3 = augment_batch(jax.random.key(4), jnp.asarray(imgs), jnp.asarray(labs))
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(a3[0]))


def test_augment_s2l_joint_transform(rng):
    """Image and weight channels must receive the same geometric transform."""
    imgs = rng.rand(4, 32, 32).astype(np.float32)
    scr = rng.randint(0, 5, (4, 32, 32)).astype(np.int32)
    # weight channel 0 == image so the transform must keep them equal
    w = np.repeat(imgs[..., None], 4, axis=-1).astype(np.float32)
    key = jax.random.key(0)
    ai, ascr, aw = augment_batch_s2l(
        key, jnp.asarray(imgs), jnp.asarray(scr), jnp.asarray(w)
    )
    assert np.allclose(np.asarray(ai), np.asarray(aw)[..., 0])
    assert np.asarray(ascr).shape == (4, 32, 32)


def test_host_random_generator_semantics(rng):
    gen = HostRandomGenerator((256, 256), seed=11)
    sample = {
        "image": rng.rand(256, 216).astype(np.float32),
        "label": rng.randint(0, 5, (256, 216)).astype(np.int32),
    }
    out = gen(dict(sample))
    assert out["image"].shape == (256, 256)
    assert out["label"].shape == (256, 256)
    assert out["image"].dtype == np.float32
    assert set(np.unique(out["label"])) <= {0, 1, 2, 3, 4}
