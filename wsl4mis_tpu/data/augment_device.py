"""On-device (jit-compatible) geometric augmentation.

TPU-native replacement for the reference's host-side RandomGenerator
(/root/reference/code/dataloaders/dataset_semi.py:146-171). The policy is
identical in distribution:

    with prob 1/2:   rot90 by k ~ U{0..3} then flip along axis ~ U{0,1}
    else prob 1/4:   nearest rotate by integer angle ~ U{-20..19},
                     image filled with 0, label filled with 4 when the label
                     contains the scribble ignore class, else 0
    else prob 1/4:   identity

The reference augments at native resolution then order-0 zooms to 256x256;
here slices are pre-zoomed once at load time and augmented on the square
grid inside the jitted train step — zero host work per step, static shapes,
and the gather-based nearest rotate was verified element-exact against
scipy.ndimage.rotate(order=0, reshape=False) semantics.

All functions are shape-polymorphic over square (H, W) slices and vmapped
over the batch; randomness comes from an explicit JAX PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rotate_nearest(img: jnp.ndarray, angle_deg: jnp.ndarray, cval) -> jnp.ndarray:
    """Nearest-neighbour rotate matching scipy.ndimage.rotate(order=0).

    Inverse mapping with matrix [[cos, sin], [-sin, cos]] about the pixel
    center ((H-1)/2, (W-1)/2); a source coordinate is valid iff it lies in
    [0, size-1] *before* rounding, and rounding is half-up — both verified
    element-exact against scipy.
    """
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = angle_deg.astype(jnp.float32) * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    sy = c * yy + s * xx + cy
    sx = -s * yy + c * xx + cx
    inside = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
    iy = jnp.clip(jnp.floor(sy + 0.5).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(jnp.floor(sx + 0.5).astype(jnp.int32), 0, w - 1)
    vals = img[iy, ix]
    return jnp.where(inside, vals, jnp.asarray(cval, dtype=img.dtype))


def _rot90_flip(img: jnp.ndarray, k: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """rot90 by k in {0..3} then flip along axis in {0,1} (square arrays)."""
    rotated = jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
        ],
        img,
    )
    return jnp.where(axis == 0, rotated[::-1, :], rotated[:, ::-1])


def _augment_one_multi(key, arrays, cvals):
    """Apply one sampled transform jointly to several (H, W)/(H, W, K) maps.

    arrays: tuple of arrays sharing leading (H, W) dims; cvals: fill value
    per array for the rotate branch. Trailing channel dims are transformed
    channelwise (used by S2L's per-pixel EMA weight buffer,
    dataset_s2l.py:126-152).
    """
    k_branch, k_aux = jax.random.split(key)
    u1, u2 = jax.random.uniform(k_branch, (2,))
    branch = jnp.where(u1 > 0.5, 0, jnp.where(u2 > 0.5, 1, 2))
    k_rot = jax.random.randint(k_aux, (), 0, 4)
    k_a, k_b = jax.random.split(k_aux)
    axis = jax.random.randint(k_a, (), 0, 2)
    angle = jax.random.randint(k_b, (), -20, 20)

    def _apply2d(fn, arr):
        if arr.ndim == 2:
            return fn(arr)
        moved = jnp.moveaxis(arr, -1, 0)
        return jnp.moveaxis(jax.vmap(fn)(moved), 0, -1)

    def do_rotflip(args):
        return tuple(
            _apply2d(lambda a: _rot90_flip(a, k_rot, axis), arr) for arr in args
        )

    def do_rotate(args):
        return tuple(
            _apply2d(lambda a, cv=cv: _rotate_nearest(a, angle, cv), arr)
            for arr, cv in zip(args, cvals)
        )

    def do_identity(args):
        return args

    return jax.lax.switch(
        branch, [do_rotflip, do_rotate, do_identity], tuple(arrays)
    )


def augment_batch_s2l(rng, images, scribbles, weights):
    """Joint augmentation of (image, scribble, 4-ch weight) for S2L.

    Parity note: dataset_s2l.py:118-123 rotates *all* maps with the default
    cval=0 (the scribble is not filled with the ignore class there).
    """
    b = images.shape[0]
    keys = jax.random.split(rng, b)

    def one(key, img, scr, wgt):
        return _augment_one_multi(key, (img, scr, wgt), (0.0, 0, 0.0))

    return jax.vmap(one)(keys, images, scribbles, weights)


def _augment_one(key, image: jnp.ndarray, label: jnp.ndarray):
    k_branch, k_aux = jax.random.split(key)
    u1, u2 = jax.random.uniform(k_branch, (2,))
    # branch 0: rot90+flip (p=1/2); 1: rotate (p=1/4); 2: identity (p=1/4)
    branch = jnp.where(u1 > 0.5, 0, jnp.where(u2 > 0.5, 1, 2))
    k_rot = jax.random.randint(k_aux, (), 0, 4)
    # reuse independent bits from fresh splits for axis/angle
    k_a, k_b = jax.random.split(k_aux)
    axis = jax.random.randint(k_a, (), 0, 2)
    angle = jax.random.randint(k_b, (), -20, 20)
    label_cval = jnp.where(jnp.any(label == 4), 4, 0).astype(label.dtype)

    def do_rotflip(args):
        img, lab = args
        return (
            _rot90_flip(img, k_rot, axis),
            _rot90_flip(lab, k_rot, axis),
        )

    def do_rotate(args):
        img, lab = args
        return (
            _rotate_nearest(img, angle, 0.0),
            _rotate_nearest(lab, angle, label_cval),
        )

    def do_identity(args):
        return args

    return jax.lax.switch(
        branch, [do_rotflip, do_rotate, do_identity], (image, label)
    )


def augment_batch(rng: jax.Array, images: jnp.ndarray, labels: jnp.ndarray):
    """Augment a batch of square slices.

    Args:
      rng: PRNG key (typically folded from the step counter).
      images: (B, H, W) float.
      labels: (B, H, W) int.
    Returns:
      (images, labels) with identical shapes/dtypes.
    """
    b = images.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(_augment_one)(keys, images, labels)


def select_augment(prefer_pallas: str | None = None):
    """Pick the batch-augmentation implementation.

    On TPU the per-element gather of the exact nearest rotate costs more
    than the U-Net fwd+bwd convolutions; the Pallas kernel
    (ops/pallas/augment_pallas.py) rebuilds the same policy gather-free in
    VMEM (3-shear rotate). Same PRNG-key -> same transform selection in
    both. Override with WSL4MIS_AUG_IMPL=pallas|xla|auto.
    """
    import os

    pref = prefer_pallas or os.environ.get("WSL4MIS_AUG_IMPL", "auto")
    if pref == "xla":
        return augment_batch
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probe
        on_tpu = False
    if pref == "pallas" or (pref == "auto" and on_tpu):
        from ..ops.pallas.augment_pallas import augment_batch_pallas

        return augment_batch_pallas
    return augment_batch
