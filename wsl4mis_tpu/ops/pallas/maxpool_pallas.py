"""2x2/stride-2 max pool as Pallas TPU kernels (fwd + first-max VJP).

Why a THIRD pool implementation (after ops/maxpool.py v1/v2): the XLA
formulations can be bit-exact but XLA still owns their layouts — flax's
``nn.max_pool`` lowers to reduce-window/select-and-scatter which XLA
assigns a batch-minor layout ({0,3,2,1}; with C=16 lanes NHWC is 87%
lane-padded, so batch-minor is locally rational), while the banded-conv
Pallas custom-calls pin default row-major layouts. The round-3
fully_supervised trace bills that disagreement at ~12 ms/step of "data
formatting" relayout copies on a 34.7 ms step; the v1/v2 XLA rewrites
measured NET SLOWER because their strided-slice/interleave lowerings are
themselves relayout-class copies (RESULTS.md rounds 3-4). A Pallas pool
pins the SAME default layout as the conv kernels on both operands and
results, so no relayout seam can exist between pool and conv.

Forward: roll-based window max — xh = max(x, roll(x,-1,H)) then
xw = max(xh, roll(xh,-1,W)) puts each window's max at its even-even
corner; one strided select compacts it. jnp.roll lowers to stride-1
slices + concat (always supported); the only risky lowering is the final
stride-2 select (see _compact).

Backward: NO compaction or upsampling in-kernel. The wrapper upsamples
y and g to full resolution in XLA (broadcast+collapse, fuses into the
operand producer); the kernel is pure elementwise + rolls:
  e[h,w]    = (x == y_up)                    window-max membership
  earlier   = any e at a row-major-earlier tap of the same window
              (built from rolls of e, masked by h/w parity)
  dx        = where(e & ~earlier, g_up, 0)
which reproduces select-and-scatter's FIRST-max tie routing exactly
(post-ReLU maps tie at 0.0 constantly, so tie routing is load-bearing;
torch also routes to the first max — reference
/root/reference/code/networks/unet.py:62-66 pools with nn.MaxPool2d(2)).

Bit-parity with nn.max_pool fwd + select-and-scatter grad is tested in
tests/test_maxpool_pallas.py (interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _bh_for(h2: int, w: int, c: int, itemsize: int) -> int:
    """Output rows per grid cell: largest power of two dividing h2 with
    the (1, 2*bh, W, C) input block under ~1.5 MB of VMEM (lane-padded)."""
    cpad = -(-c // 128) * 128
    for bh in (16, 8, 4, 2, 1):
        if h2 % bh == 0 and 2 * bh * w * cpad * itemsize <= 1.5 * 2**20:
            return bh
    return 1


def _compact(xw):
    """(2bh, W, C) -> (bh, W/2, C): select even h (untiled dim — free)
    and even w (sublane stride-2 slice). WSL4MIS_POOL_COMPACT=reshape
    switches to a sublane-split reshape + unit slice in case a Mosaic
    version rejects strided sublane slices."""
    if os.environ.get("WSL4MIS_POOL_COMPACT") == "reshape":
        h2w = xw.shape[0] // 2
        r = xw[0::2].reshape(h2w, xw.shape[1] // 2, 2, xw.shape[2])
        return r[:, :, 0, :]
    return xw[0::2, 0::2, :]


def _fwd_kernel(x_ref, o_ref):
    x = x_ref[0]                                    # (2bh, W, C)
    xh = jnp.maximum(x, jnp.roll(x, -1, axis=0))    # even h: H-pair max
    xw = jnp.maximum(xh, jnp.roll(xh, -1, axis=1))  # even-even: window max
    o_ref[0] = _compact(xw)


def _bwd_kernel(x_ref, yup_ref, gup_ref, dx_ref):
    x = x_ref[0]
    e = x == yup_ref[0]
    hh = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    h_odd = (hh % 2) == 1
    w_odd = (ww % 2) == 1
    ew = jnp.roll(e, 1, axis=1)        # e at (h,   w-1)
    eh = jnp.roll(e, 1, axis=0)        # e at (h-1, w  )
    ehw = jnp.roll(eh, 1, axis=1)      # e at (h-1, w-1)
    ehwp = jnp.roll(eh, -1, axis=1)    # e at (h-1, w+1)
    # row-major earlier-tap presence per window position; roll wraps only
    # reach positions the parity masks exclude (w=0 is even, h=0 is even)
    earlier = (
        (~h_odd & w_odd & ew)
        | (h_odd & ~w_odd & (eh | ehwp))
        | (h_odd & w_odd & (ehw | eh | ew))
    )
    zero = jnp.zeros((), gup_ref.dtype)
    dx_ref[0] = jnp.where(e & ~earlier, gup_ref[0], zero)


def _up2(a):
    """(N,H2,W2,C) -> (N,2H2,2W2,C) nearest upsample (broadcast+collapse,
    fuses into the consumer — same formulation as ops/maxpool.py v2)."""
    n, h2, w2, c = a.shape
    a6 = jnp.broadcast_to(a[:, :, None, :, None, :], (n, h2, 2, w2, 2, c))
    return a6.reshape(n, 2 * h2, 2 * w2, c)


def _fwd_call(x, interpret):
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    bh = _bh_for(h2, w, c, x.dtype.itemsize)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, h2 // bh),
        in_specs=[pl.BlockSpec((1, 2 * bh, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, bh, w2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        interpret=interpret,
    )(x)


def _bwd_call(x, y_up, g_up, interpret):
    n, h, w, c = x.shape
    bh = _bh_for(h // 2, w, c, x.dtype.itemsize)
    spec = pl.BlockSpec((1, 2 * bh, w, c), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n, h // (2 * bh)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), g_up.dtype),
        interpret=interpret,
    )(x, y_up, g_up)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pool(interpret: bool, x):
    return _fwd_call(x, interpret)


def _pool_fwd(interpret, x):
    y = _fwd_call(x, interpret)
    return y, (x, y)


def _pool_bwd(interpret, res, g):
    x, y = res
    dx = _bwd_call(x, _up2(y), _up2(g), interpret)
    return (dx,)


_pool.defvjp(_pool_fwd, _pool_bwd)


def max_pool_2x2_pallas(x: jnp.ndarray, *, interpret: bool = False):
    """(N, H, W, C) -> (N, H/2, W/2, C); H and W must be even."""
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
    return _pool(interpret, x)
