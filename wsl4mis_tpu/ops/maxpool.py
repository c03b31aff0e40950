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
