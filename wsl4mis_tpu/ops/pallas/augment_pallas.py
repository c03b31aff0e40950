"""Pallas TPU kernel for on-device batch augmentation.

The XLA implementation (data/augment_device.py) expresses the arbitrary
+-20 degree nearest rotate as a per-element 2D gather — on TPU that gather
is the single most expensive op in the whole train step (measured ~17-21 ms
per batch-24 step, more than the entire U-Net forward+backward convs).

This kernel keeps each sample's planes in VMEM and rebuilds the whole
augmentation policy (reference dataset.py:147-166 / dataset_semi.py:146-171
semantics) gather-free:

  * rot90/flip  -> in-VMEM transpose + reverses;
  * rotate      -> Paeth 3-shear decomposition
                   R(t) = Sx(-tan(t/2)) Sy(sin t) Sx(-tan(t/2)),
                   each shear a static unroll of shifted-window selects
                   over the padded plane (contiguous VMEM slices, VPU
                   selects, no gathers);
  * branch/k/axis/angle sampling is identical (same key splits) to
    data/augment_device._augment_one, so a given PRNG key selects the same
    transform in both implementations.

Parity note: the 3-shear nearest rotate is the classic raster-rotation
algorithm and agrees with scipy.ndimage.rotate(order=0, reshape=False)
on the vast majority of pixels (tested >= 97% agreement; disagreements are
single-pixel rounding at shear boundaries). The exact-map implementation
remains available in data/augment_device.py and the host path
(data/augment.py) is byte-exact with the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max |shear shift| at +-20 degrees on 256^2: x-shear tan(10)*127.5 ~ 22.5,
# y-shear sin(20)*127.5 ~ 43.6. Headroom for any patch size <= 320.
MAXS_X = 29
MAXS_Y = 56


def shear_offsets(angle_deg, h: int, w: int):
    """Integer per-row / per-column shifts of the Paeth 3-shear rotation.

    Returns (o1 (h,), o2 (w,), o3 (h,)) int32 for the x-shear / y-shear /
    x-shear passes, about the pixel center ((h-1)/2, (w-1)/2) — the same
    center convention as data/augment_device._rotate_nearest.

    The two x-shears use staggered rounding phases (+1/4 and +3/4): by the
    Hermite identity floor(u+1/4) + floor(u+3/4) = floor(2u+1/2), their
    summed displacement is exactly round-half-up of the total continuous
    x-displacement, instead of jumping by 2 when a single in-phase rounding
    crosses .5 (which halves the pixel agreement with the direct map).
    """
    # sign matches data/augment_device._rotate_nearest's inverse-map
    # convention (sy = c*yy + s*xx): the shear pipeline below realizes the
    # same rotation direction with theta negated.
    theta = -angle_deg.astype(jnp.float32) * (jnp.pi / 180.0)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    uy = a * (jnp.arange(h, dtype=jnp.float32) - cy)
    o1 = jnp.floor(uy + 0.25)
    o3 = jnp.floor(uy + 0.75)
    o2 = jnp.floor(b * (jnp.arange(w, dtype=jnp.float32) - cx) + 0.5)
    return o1.astype(jnp.int32), o2.astype(jnp.int32), o3.astype(jnp.int32)


def _shear_rows(x, off, cval, maxs: int, h: int, w: int):
    """out[i, j] = x[i, j - off[i]] with fill cval (static unroll)."""
    fill = jnp.full((h, maxs), cval, x.dtype)
    xp = jnp.concatenate([fill, x, fill], axis=1)  # (h, w + 2*maxs)
    acc = jnp.full((h, w), cval, x.dtype)
    offc = off.reshape(h, 1)
    for d in range(-maxs, maxs + 1):
        # reading x[i, j - d] == xp[i, maxs - d + j]
        win = jax.lax.slice(xp, (0, maxs - d), (h, maxs - d + w))
        acc = jnp.where(offc == d, win, acc)
    return acc


def _shear_cols(x, off, cval, maxs: int, h: int, w: int):
    """out[i, j] = x[i - off[j], j] with fill cval (static unroll)."""
    fill = jnp.full((maxs, w), cval, x.dtype)
    xp = jnp.concatenate([fill, x, fill], axis=0)  # (h + 2*maxs, w)
    acc = jnp.full((h, w), cval, x.dtype)
    offr = off.reshape(1, w)
    for d in range(-maxs, maxs + 1):
        win = jax.lax.slice(xp, (maxs - d, 0), (maxs - d + h, w))
        acc = jnp.where(offr == d, win, acc)
    return acc


def _rotate3(x, o1, o2, o3, cval, h: int, w: int):
    t = _shear_rows(x, o1, cval, MAXS_X, h, w)
    t = _shear_cols(t, o2, cval, MAXS_Y, h, w)
    return _shear_rows(t, o3, cval, MAXS_X, h, w)


def _anti_identity(n: int):
    """J with J[i, n-1-i] = 1: J @ x flips rows, x @ J flips columns.
    Mosaic has no `rev` lowering; a one-hot matmul on the MXU is exact
    (single nonzero per dot) and effectively free at 256^2."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ii + jj == n - 1).astype(jnp.float32)


def _rot90_flip(x, k, axis, jh, jw):
    """np.rot90 by k then flip along axis, via transpose + J-matmuls.

    Operates in float32 (label values are small ints, exact in f32)."""

    def flipud(v):
        return jax.lax.dot(jh, v, precision=jax.lax.Precision.HIGHEST)

    def fliplr(v):
        return jax.lax.dot(v, jw, precision=jax.lax.Precision.HIGHEST)

    xt = x.T
    r1 = flipud(xt)           # rot90(x, 1)
    r2 = flipud(fliplr(x))    # rot90(x, 2)
    r3 = fliplr(xt)           # rot90(x, 3)
    rot = jnp.where(k == 0, x, jnp.where(k == 1, r1, jnp.where(k == 2, r2, r3)))
    return jnp.where(axis == 0, flipud(rot), fliplr(rot))


def _aug_plane(x, branch, k, axis, o1, o2, o3, cval, jh, jw, h: int, w: int):
    rf = _rot90_flip(x.astype(jnp.float32), k, axis, jh, jw).astype(x.dtype)
    rt = _rotate3(x, o1, o2, o3, cval, h, w)
    return jnp.where(branch == 0, rf, jnp.where(branch == 1, rt, x))


def _aug_kernel(img_ref, lab_ref, scal_ref, o1_ref, o2_ref, o3_ref,
                img_out, lab_out, *, h: int, w: int):
    branch = scal_ref[0, 0, 0]
    k = scal_ref[0, 0, 1]
    axis = scal_ref[0, 0, 2]
    labcval = scal_ref[0, 0, 3]
    o1 = o1_ref[0, 0]
    o2 = o2_ref[0, 0]
    o3 = o3_ref[0, 0]
    jh = _anti_identity(h)
    jw = _anti_identity(w)
    img_out[0] = _aug_plane(img_ref[0], branch, k, axis, o1, o2, o3,
                            jnp.float32(0.0), jh, jw, h, w)
    lab = lab_ref[0]
    lab_out[0] = _aug_plane(lab, branch, k, axis, o1, o2, o3,
                            labcval.astype(lab.dtype), jh, jw, h, w)


def _sample_policy(keys, labels):
    """Per-sample transform draw — identical key usage to
    data/augment_device._augment_one so the same key picks the same
    transform in both implementations."""

    def draw(key, label):
        k_branch, k_aux = jax.random.split(key)
        u1, u2 = jax.random.uniform(k_branch, (2,))
        branch = jnp.where(u1 > 0.5, 0, jnp.where(u2 > 0.5, 1, 2))
        k_rot = jax.random.randint(k_aux, (), 0, 4)
        k_a, k_b = jax.random.split(k_aux)
        axis = jax.random.randint(k_a, (), 0, 2)
        angle = jax.random.randint(k_b, (), -20, 20)
        cval = jnp.where(jnp.any(label == 4), 4, 0)
        return branch, k_rot, axis, angle, cval

    return jax.vmap(draw)(keys, labels)


@functools.partial(jax.jit, static_argnames=("interpret",))
def augment_batch_pallas(rng, images, labels, *, interpret: bool = False):
    """Drop-in replacement for data.augment_device.augment_batch.

    images: (B, H, W) float32; labels: (B, H, W) int32.

    The shear-window unroll is sized for patch sizes <= 320 (MAXS_X/MAXS_Y
    above); larger planes would silently fill rotate-branch rows/cols with
    cval, so they are routed to the element-exact XLA gather path instead
    (ADVICE round-2: no silent corruption for --patch_size > 320).
    """
    b, h, w = images.shape
    if h > 320 or w > 320:
        from ...data.augment_device import augment_batch

        return augment_batch(rng, images, labels)
    keys = jax.random.split(rng, b)
    branch, k_rot, axis, angle, labcval = _sample_policy(keys, labels)
    o1, o2, o3 = jax.vmap(lambda a: shear_offsets(a, h, w))(angle)
    scal = jnp.stack(
        [branch, k_rot, axis, labcval], axis=1
    ).astype(jnp.int32).reshape(b, 1, 4)

    kernel = functools.partial(_aug_kernel, h=h, w=w)
    img_out, lab_out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), images.dtype),
            jax.ShapeDtypeStruct((b, h, w), labels.dtype),
        ],
        interpret=interpret,
    )(images.astype(jnp.float32), labels.astype(jnp.int32), scal,
      o1.reshape(b, 1, h), o2.reshape(b, 1, w), o3.reshape(b, 1, h))
    return img_out, lab_out


def rotate_shear3_reference(img, angle_deg, cval):
    """Host/numpy reference of the kernel's 3-shear nearest rotate (for
    tests and documentation of the exact algorithm)."""
    import numpy as np

    h, w = img.shape
    theta = -np.deg2rad(float(angle_deg))
    a, b = -np.tan(theta / 2.0), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    uy = a * (np.arange(h) - cy)
    o1 = np.floor(uy + 0.25).astype(np.int64)
    o3 = np.floor(uy + 0.75).astype(np.int64)
    o2 = np.floor(b * (np.arange(w) - cx) + 0.5).astype(np.int64)

    def srows(x, off):
        out = np.full_like(x, cval)
        for i in range(h):
            src = np.arange(w) - off[i]
            ok = (src >= 0) & (src < w)
            out[i, ok] = x[i, src[ok]]
        return out

    def scols(x, off):
        out = np.full_like(x, cval)
        for j in range(w):
            src = np.arange(h) - off[j]
            ok = (src >= 0) & (src < h)
            out[ok, j] = x[src[ok], j]
        return out

    return srows(scols(srows(img, o1), o2), o3)
