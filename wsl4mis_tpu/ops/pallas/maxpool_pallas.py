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

Forward: split-reshape + max — (2bh, W, C) -> (bh, 2, W, C) -> max over
axis 1, then (bh, W, C) -> (bh, W/2, 2, C) -> max over axis 2. The
sublane-split reshape is the ONE stride-2-equivalent this Mosaic
backend actually compiles; every other formulation was probed on-chip
and fails (tests/test_tpu_lowering.py guards the survivor):
  * non-unit-step getitem -> gather ("Only 2D gather is supported");
  * lax.slice with strides -> vector.extract_strided_slice whose MLIR
    verifier requires strides in [1, 2);
  * stride-2 ref loads (pl.Slice(0, n, 2)) on either the outer or the
    sublane dim -> tpu_compile_helper backend crash (HTTP 500).

Backward: NO compaction or upsampling in-kernel. The wrapper upsamples
y and g to full resolution in XLA (broadcast+collapse, fuses into the
operand producer); the kernel is pure elementwise + unit SHIFTS:
  e[h,w]    = (x == y_up)                    window-max membership
  earlier   = any e at a row-major-earlier tap of the same window
              (built from zero-filled unit shifts of e, masked by h/w
              parity — jnp.roll AND pltpu.roll fail Mosaic lowering here
              with `in_bounds_vreg.getType() == native_vreg_ty`; a
              unit-stride slice + concat shift compiles on both the
              untiled and sublane axes, probed on-chip)
  dx        = where(e & ~earlier, g_up, 0)
Shifts never cross a window boundary that matters: windows are 2x2
aligned to even indices and blocks are even-height (2*bh), so every
earlier-tap neighbor lives in the same block; the zero fill only lands
at positions the parity masks already exclude.
which reproduces select-and-scatter's FIRST-max tie routing exactly
(post-ReLU maps tie at 0.0 constantly, so tie routing is load-bearing;
torch also routes to the first max — reference
/root/reference/code/networks/unet.py:62-66 pools with nn.MaxPool2d(2)).

Bit-parity with nn.max_pool fwd + select-and-scatter grad is tested in
tests/test_maxpool_pallas.py (interpret mode).
"""

from __future__ import annotations

import functools

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


def _fwd_kernel(x_ref, o_ref):
    x = x_ref[0]                                    # (2bh, W, C)
    h2b, w, c = x.shape
    xh = jnp.max(x.reshape(h2b // 2, 2, w, c), axis=1)
    o_ref[0] = jnp.max(xh.reshape(h2b // 2, w // 2, 2, c), axis=2)


def _shift1(a, axis, forward):
    """Zero-filled unit shift along axis 0/1 of a 3D array via unit-stride
    slice + concat (the one neighbor-access lowering this Mosaic backend
    compiles; see module docstring). forward=True yields a'[i] = a[i-1]."""
    zshape = list(a.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, a.dtype)
    sl = [slice(None)] * 3
    if forward:
        sl[axis] = slice(0, a.shape[axis] - 1)
        return jnp.concatenate([z, a[tuple(sl)]], axis=axis)
    sl[axis] = slice(1, a.shape[axis])
    return jnp.concatenate([a[tuple(sl)], z], axis=axis)


def _bwd_kernel(x_ref, yup_ref, gup_ref, dx_ref):
    # ALL comparisons upcast to f32: any bf16 cmp -> i1 fails Mosaic
    # lowering on this backend (`in_bounds_vreg.getType() ==
    # native_vreg_ty` assert), while the identical f32 cmp compiles —
    # probed on-chip, guarded by tests/test_tpu_lowering.py. bf16->f32 is
    # exact, so equality (incl. tie routing) is unchanged.
    x = x_ref[0].astype(jnp.float32)
    e = x == yup_ref[0].astype(jnp.float32)
    hh = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    h_odd = (hh % 2) == 1
    w_odd = (ww % 2) == 1
    # shift a numeric 0/1 mask, not the i1 vector (safer vreg types)
    en = jnp.where(e, jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32))
    ew = _shift1(en, 1, True) > 0      # e at (h,   w-1)
    ehn = _shift1(en, 0, True)
    eh = ehn > 0                       # e at (h-1, w  )
    ehw = _shift1(ehn, 1, True) > 0    # e at (h-1, w-1)
    ehwp = _shift1(ehn, 1, False) > 0  # e at (h-1, w+1)
    # row-major earlier-tap presence per window position; the zero fill
    # only reaches positions the parity masks exclude (w=0, h=0 are even)
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
