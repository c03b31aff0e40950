"""Fused 2x2/stride-2 max pool (fwd strided-max, bwd first-max masks).

Why: flax's ``nn.max_pool`` lowers to ``reduce-window`` and its gradient
to ``select-and-scatter``; on TPU XLA assigns both a batch-minor layout
({0,3,2,1}), while the Pallas banded-conv custom-calls pin the default
row-major layout on their operands. In the round-3 fully_supervised trace
that disagreement cost ~12 ms/step of "data formatting" copies on a 34 ms
step, with the pooling ops themselves another ~2.9 ms (scripts/
analyze_trace.py). This formulation is four strided slices + elementwise
max (forward) and elementwise compares + an interleave (backward): every
op fuses into neighbouring loop fusions in the default layout, so the
relayout copies disappear.

Semantics: identical to ``nn.max_pool(x, (2,2), strides=(2,2))`` in the
forward, and to its select-and-scatter gradient in the backward — XLA
scatters the cotangent to the FIRST maximum in row-major window order
((0,0),(0,1),(1,0),(1,1)), which matters because post-ReLU feature maps
tie at 0.0 constantly. Bit-parity (fwd + grad, tie-heavy inputs) is
tested in tests/test_maxpool.py.

Reference: the torch encoder pools with nn.MaxPool2d(2)
(/root/reference/code/networks/unet.py:62-66); torch also routes the
gradient to the first max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _taps(x):
    """The four window taps, each (N, H/2, W/2, C), row-major order."""
    return (
        x[:, 0::2, 0::2, :],
        x[:, 0::2, 1::2, :],
        x[:, 1::2, 0::2, :],
        x[:, 1::2, 1::2, :],
    )


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, C); H and W must be even."""
    t00, t01, t10, t11 = _taps(x)
    return jnp.maximum(jnp.maximum(t00, t01), jnp.maximum(t10, t11))


def _fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    t00, t01, t10, t11 = _taps(x)
    m00 = t00 == y
    m01 = (t01 == y) & ~m00
    m10 = (t10 == y) & ~(m00 | m01)
    m11 = ~(m00 | m01 | m10)
    zero = jnp.zeros_like(g)
    row0 = _interleave_w(jnp.where(m00, g, zero), jnp.where(m01, g, zero))
    row1 = _interleave_w(jnp.where(m10, g, zero), jnp.where(m11, g, zero))
    n, h2, w, c = row0.shape
    dx = jnp.stack([row0, row1], axis=2).reshape(n, 2 * h2, w, c)
    return (dx,)


def _interleave_w(a, b):
    """(N,H,W2,C) x2 -> (N,H,2*W2,C), a in even columns, b in odd."""
    n, h, w2, c = a.shape
    return jnp.stack([a, b], axis=3).reshape(n, h, 2 * w2, c)


max_pool_2x2.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# v2: broadcast-formulated backward (WSL4MIS_POOL_IMPL=fused2)
#
# The v1 backward above builds dx by stacking/reshaping four masked
# cotangent tensors — stack->reshape is a sublane interleave that XLA
# materializes as copies, and the on-chip A/B measured it NET SLOWER than
# select-and-scatter (RESULTS.md round 3). v2 keeps identical first-max
# semantics but formulates dx elementwise at FULL resolution:
#
#   dx[n,h,w,c] = g[n,h/2,w/2,c] * (first_max_tap[n,h/2,w/2,c] ==
#                                   2*(h%2) + (w%2))
#
# The pooled-resolution operands reach full resolution via
# broadcast+collapse (a degenerate-dim broadcast: each output element
# reads exactly one input element at a linear index map), which fuses
# into the consuming loop instead of materializing an interleave; the
# window-position pattern is two fused iotas. One loop fusion, no copies.
# ---------------------------------------------------------------------------


def _first_max_tap(x, y):
    """Row-major index (0..3) of the first window tap equal to the max."""
    t00, t01, t10, _ = _taps(x)
    i = jnp.full(y.shape, 3, jnp.int32)
    i = jnp.where(t10 == y, 2, i)
    i = jnp.where(t01 == y, 1, i)
    return jnp.where(t00 == y, 0, i)


def _up2(a):
    """(N,H2,W2,C) -> (N,2*H2,2*W2,C) nearest upsample (broadcast+collapse)."""
    n, h2, w2, c = a.shape
    a6 = jnp.broadcast_to(a[:, :, None, :, None, :], (n, h2, 2, w2, 2, c))
    return a6.reshape(n, 2 * h2, 2 * w2, c)


@jax.custom_vjp
def max_pool_2x2_v2(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, C); H and W must be even."""
    t00, t01, t10, t11 = _taps(x)
    return jnp.maximum(jnp.maximum(t00, t01), jnp.maximum(t10, t11))


def _fwd_v2(x):
    y = max_pool_2x2_v2(x)
    return y, (x, y)


def _bwd_v2(res, g):
    x, y = res
    n, h, w, c = x.shape
    idx_up = _up2(_first_max_tap(x, y))
    pos_h = jax.lax.broadcasted_iota(jnp.int32, (n, h, w, c), 1) % 2
    pos_w = jax.lax.broadcasted_iota(jnp.int32, (n, h, w, c), 2) % 2
    pos = 2 * pos_h + pos_w
    dx = jnp.where(idx_up == pos, _up2(g), jnp.zeros((), g.dtype))
    return (dx,)


max_pool_2x2_v2.defvjp(_fwd_v2, _bwd_v2)


# ---------------------------------------------------------------------------
# v3: selection-matmul pool (WSL4MIS_POOL_IMPL=fused3)
#
# v1/v2 still lost on-chip because their strided W-slices / interleaves are
# LANE-granular (C-lane sub-blocks moving at stride 2C), which the VPU
# handles with expensive shuffle sequences — the same reason the round-4
# standalone Pallas pool lost 2.1x. v3 keeps every op BLOCK-granular:
#
#   * view a row as (K, 128) lane blocks (free bitcast: W*C % 128 == 0);
#   * pixel-pair max:   e = b_pairs . SE,  o = b_pairs . SO  with static
#     0/1 selection matrices (2, 128, 128) — an MXU matmul IS the TPU-
#     native lane permutation (~6 GFLOP/step total for the UNet, noise
#     against the conv budget, and dots keep the default layout);
#   * row-pair max: stride-2 slice on a MAJOR axis (block-granular).
#
# No reduce-window / select-and-scatter remains in the graph, so their
# batch-minor layout preference cannot poison the neighbouring BN/LeakyReLU
# fusions or the Pallas-call boundaries (the round-5 HLO/trace join billed
# those copies at more than the pool ops themselves). The backward is the
# transposed selection dots + first-max where-masks: exact row-major
# first-max routing (pixel max inside each row first, then row max
# preferring row 0), identical to select-and-scatter.
# ---------------------------------------------------------------------------


def _v3_applicable(shape) -> bool:
    n, h, w, c = shape
    if h % 2 or w % 2:
        return False
    if (w * c) % 256:
        return False
    if c >= 128:
        return c % 128 == 0
    return 128 % c == 0 and (128 // c) % 2 == 0


@functools.lru_cache(maxsize=None)
def _sel_mats(c: int):
    """(2,128,128) 0/1 matrices routing even/odd pixels of a 128-block
    pair into one pooled 128-block (exact in bf16: single-term sums)."""
    import numpy as np

    ppb = 128 // c
    se = np.zeros((2, 128, 128), np.float32)
    so = np.zeros((2, 128, 128), np.float32)
    for t in range(2):
        for p in range(ppb):
            dst = ((t * ppb + p) // 2) * c
            m = se if p % 2 == 0 else so
            for ci in range(c):
                m[t, p * c + ci, dst + ci] = 1.0
    return se, so


def _v3_pixel_pairs(x):
    """(N,H,W,C) -> (e, o): even/odd-pixel C-blocks regrouped to pooled
    128-lane blocks, each (N, H, K2, 128)."""
    n, h, w, c = x.shape
    k = (w * c) // 128
    b = x.reshape(n, h, k, 128)
    if c >= 128:
        cb = c // 128  # blocks per pixel; pixel pairs are block-granular
        bp = b.reshape(n, h, k // (2 * cb), 2, cb * 128)
        return bp[:, :, :, 0].reshape(n, h, k // 2, 128), \
            bp[:, :, :, 1].reshape(n, h, k // 2, 128)
    se, so = _sel_mats(c)
    bp = b.reshape(n, h, k // 2, 2, 128)
    se = jnp.asarray(se, x.dtype)
    so = jnp.asarray(so, x.dtype)
    e = jax.lax.dot_general(
        bp, se, (((3, 4), (0, 1)), ((), ())),
        preferred_element_type=x.dtype,
    )
    o = jax.lax.dot_general(
        bp, so, (((3, 4), (0, 1)), ((), ())),
        preferred_element_type=x.dtype,
    )
    return e, o


def _v3_expand(ge, go, c: int, w: int):
    """Transpose of _v3_pixel_pairs: pooled-block cotangents -> full-res
    (N, H, W, C)."""
    n, h, k2 = ge.shape[:3]
    if c >= 128:
        cb = c // 128
        g2 = jnp.stack(
            [ge.reshape(n, h, k2 // cb, cb * 128),
             go.reshape(n, h, k2 // cb, cb * 128)], axis=3)
        return g2.reshape(n, h, w, c)
    se, so = _sel_mats(c)
    se = jnp.asarray(se, ge.dtype)
    so = jnp.asarray(so, ge.dtype)
    gx = jax.lax.dot_general(
        ge, se, (((3,), (2,)), ((), ())), preferred_element_type=ge.dtype,
    ) + jax.lax.dot_general(
        go, so, (((3,), (2,)), ((), ())), preferred_element_type=go.dtype,
    )  # (N, H, K2, 2, 128)
    return gx.reshape(n, h, w, c)


@jax.custom_vjp
def max_pool_2x2_v3(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, C); see _v3_applicable for shapes."""
    n, h, w, c = x.shape
    e, o = _v3_pixel_pairs(x)
    pm = jnp.maximum(e, o)                       # pixel max per full row
    y = jnp.maximum(pm[:, 0::2], pm[:, 1::2])    # row max, prefer row 0
    return y.reshape(n, h // 2, w // 2, c)


def _fwd_v3(x):
    return max_pool_2x2_v3(x), x


def _bwd_v3(x, g):
    n, h, w, c = x.shape
    e, o = _v3_pixel_pairs(x)
    pm = jnp.maximum(e, o)
    pm0, pm1 = pm[:, 0::2], pm[:, 1::2]
    gb = g.reshape(n, h // 2, (w * c) // 256, 128)
    zero = jnp.zeros((), g.dtype)
    gr0 = jnp.where(pm0 >= pm1, gb, zero)        # ties -> row 0 (first)
    gr1 = gb - gr0
    grow = jnp.stack([gr0, gr1], axis=2).reshape(n, h, (w * c) // 256, 128)
    ge = jnp.where(e >= o, grow, zero)           # ties -> even pixel
    go = grow - ge
    return (_v3_expand(ge, go, c, w),)


max_pool_2x2_v3.defvjp(_fwd_v3, _bwd_v3)


# ---------------------------------------------------------------------------
# Flat-domain v3 (round 5): identical selection-matmul pool, but input and
# output are the FLAT lane-dense (N, H, W*C) view (== row-major NHWC
# bytes, e.g. a dense_chainable grouped conv output reshaped 3D). With no
# 4D small-C tensor on either side, XLA cannot interpose its W-/H-minor
# tiled layouts at the pool seam — the encoder stays in the flat domain
# from one banded conv to the next (models/unet.py Encoder, knob
# WSL4MIS_POOL_CHAIN). Bit-parity with max_pool_2x2_v3 (same math on the
# same bytes) is tested in tests/test_maxpool.py.
# ---------------------------------------------------------------------------


def _flat_pixel_pairs(xb, c: int):
    """(N,H,K,128) lane blocks -> (e, o) even/odd-pixel pooled blocks,
    each (N,H,K/2,128) — the block body of _v3_pixel_pairs."""
    n, h, k, _ = xb.shape
    if c >= 128:
        cb = c // 128
        bp = xb.reshape(n, h, k // (2 * cb), 2, cb * 128)
        return bp[:, :, :, 0].reshape(n, h, k // 2, 128), \
            bp[:, :, :, 1].reshape(n, h, k // 2, 128)
    se, so = _sel_mats(c)
    bp = xb.reshape(n, h, k // 2, 2, 128)
    se = jnp.asarray(se, xb.dtype)
    so = jnp.asarray(so, xb.dtype)
    e = jax.lax.dot_general(
        bp, se, (((3, 4), (0, 1)), ((), ())),
        preferred_element_type=xb.dtype,
    )
    o = jax.lax.dot_general(
        bp, so, (((3, 4), (0, 1)), ((), ())),
        preferred_element_type=xb.dtype,
    )
    return e, o


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_flat(xf: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, H, L) flat dense rows (L = W*C) -> (N, H/2, L/2)."""
    n, h, length = xf.shape
    e, o = _flat_pixel_pairs(xf.reshape(n, h, length // 128, 128), c)
    pm = jnp.maximum(e, o)
    y = jnp.maximum(pm[:, 0::2], pm[:, 1::2])
    return y.reshape(n, h // 2, length // 2)


def _fwd_flat(xf, c):
    return max_pool_2x2_flat(xf, c), xf


def _bwd_flat(c, xf, g):
    n, h, length = xf.shape
    e, o = _flat_pixel_pairs(xf.reshape(n, h, length // 128, 128), c)
    pm = jnp.maximum(e, o)
    pm0, pm1 = pm[:, 0::2], pm[:, 1::2]
    gb = g.reshape(n, h // 2, length // 256, 128)
    zero = jnp.zeros((), g.dtype)
    gr0 = jnp.where(pm0 >= pm1, gb, zero)        # ties -> row 0 (first)
    gr1 = gb - gr0
    grow = jnp.stack([gr0, gr1], axis=2).reshape(n, h, length // 256, 128)
    ge = jnp.where(e >= o, grow, zero)           # ties -> even pixel
    go = grow - ge
    w = length // c
    return (_v3_expand(ge, go, c, w).reshape(n, h, length),)


max_pool_2x2_flat.defvjp(_fwd_flat, _bwd_flat)
