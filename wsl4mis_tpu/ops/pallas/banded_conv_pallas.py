"""In-VMEM banded-matmul 3x3 convolution (Pallas TPU kernel).

Why (RESULTS.md round-2 roofline): the reference U-Net's channel widths
are 16/32 at the highest resolutions (/root/reference/code/networks/
unet.py:286-295). The MXU multiplies 128x128 tiles, so the direct lowering
pads the contraction 9C -> 128k and the output channels O -> 128; at C=16
that is ~7% tile occupancy and the padded-FLOP cost of the train step is
~4x its true FLOPs. ops/banded_conv.py re-expresses the conv as banded
matmuls with near-dense tiles, but its graph-level jnp formulation
materializes the regrouped activations in HBM and measured *slower*
(50 -> 213 ms/step, round-2 negative result). This module builds the
banded A-tiles **inside VMEM**, which is the whole trick:

  * flatten each padded row's (W, C) into one W*C lane vector; the
    overlapping P-pixel input group g (P = J+2) is then the flat window
    [g*J*C, g*J*C + P*C) — an overlapping slide of stride J*C;
  * in-kernel, reshape the row to chunks of size chunk = C*gcd(J,P) and
    assemble A[g] from nparts *unit-stride* chunk slices (no gathers, no
    strided slices — Mosaic-friendly register shuffles);
  * concatenate the three dy row-shifted views of A along the contraction
    dim: one dot per block, (BH*G, 3*P*C) @ (3*P*C, J*O), f32 accumulate.
    For C=16, O=16, J=6 that is K=384, N=96: ~3.6x padded FLOPs vs the
    direct lowering's ~14x;
  * the H halo comes from passing the input twice with block index maps
    (h) and (h+1) and concatenating two rows in-kernel — standard Pallas
    pipelining, no manual DMA;
  * custom VJP: dx is the same forward kernel applied to the cotangent
    with the rotated/transposed kernel; dk is a wgrad kernel computing
    dWb = A3^T @ g_grouped accumulated over the whole grid (a dense
    (3PC x M)@(M x JO) matmul), band entries extracted outside.

Semantics: SAME-padded, stride-1, cross-correlation with HWIO kernels —
identical (up to f32 accumulation order) to
lax.conv_general_dilated(x, k, (1,1), 'SAME', NHWC/HWIO), verified by
tests/test_banded_pallas.py in interpreter mode.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ceil128(v: int) -> int:
    return -(-v // 128) * 128


@dataclass(frozen=True)
class Plan:
    c: int          # input channels
    o: int          # output channels
    h: int
    w: int
    j: int          # output pixels per group
    p: int          # input pixels per group (= j + 2)
    bh: int         # output rows per grid cell
    g: int          # groups per row
    chunk: int      # flat-row chunk size (= c * gcd(j, p))
    stride: int     # chunks per group stride (= j*c / chunk)
    nparts: int     # chunks per window (= p*c / chunk)
    dim1: int       # padded chunk-rows of the reshaped flat row
    l: int          # padded flat row length (= stride * chunk * dim1)

    @property
    def cost_per_pixel(self) -> float:
        return 2.0 * _ceil128(3 * self.p * self.c) * _ceil128(self.j * self.o) / self.j


def _direct_cost_per_pixel(c: int, o: int) -> float:
    return 2.0 * _ceil128(9 * c) * _ceil128(o)


@functools.lru_cache(maxsize=None)
def plan_banded(c: int, o: int, h: int, w: int) -> Plan | None:
    """Choose the banded configuration for a (C,O,H,W) 3x3 conv, or None
    when the direct lowering is already close to dense (C >= 128ish) or
    the shape doesn't block cleanly."""
    bh = None
    for cand in (32, 16, 8, 4, 2):
        if h % cand == 0:
            bh = cand
            break
    if bh is None or h < 2:
        return None
    best = None
    for j in (1, 2, 3, 4, 6, 8, 12, 16):
        p = j + 2
        chunk = c * math.gcd(j, p)
        if chunk < 32 or chunk % 8:
            continue  # lane-layout too fragmented for VMEM shuffles
        if j > w:
            continue
        g = -(-w // j)
        if g < 2:
            continue
        stride = (j * c) // chunk
        nparts = (p * c) // chunk
        dim1 = (nparts - 1) // stride + g
        l = stride * chunk * dim1
        if l < (p + j * (g - 1)) * c:  # must cover the last window
            dim1 += 1
            l = stride * chunk * dim1
        plan = Plan(c, o, h, w, j, p, bh, g, chunk, stride, nparts, dim1, l)
        # VMEM guard: rows + A + A3 + out, double-buffered inputs
        vmem = (bh + 2) * l * 2 * 2 + bh * g * (4 * p * c) * 2 + bh * g * _ceil128(j * o) * 4
        if vmem > 12 * 2 ** 20:
            continue
        if best is None or plan.cost_per_pixel < best.cost_per_pixel:
            best = plan
    if best is None:
        return None
    if best.cost_per_pixel > 0.85 * _direct_cost_per_pixel(c, o):
        return None  # no meaningful win over the direct lowering
    return best


def band_weights3(kernel: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(3, 3, C, O) HWIO -> (3*P*C, J*O) stacked banded matrix.

    Row layout matches the kernel's A3 concat: [dy=0 | dy=1 | dy=2] blocks
    of P*C rows each; within a block, rows (p*C + i) map to input pixel
    offset p of the window, columns (j*O + o) to output pixel j. The band
    is k[dy, p-j, i, o] for p-j in {0,1,2}. Built with static indices so
    the structure is a compile-time constant; values flow differentiably.
    """
    kh, kw, c, o = kernel.shape
    assert kh == 3 and kw == 3
    p, j = plan.p, plan.j
    out = jnp.zeros((3, p, c, j, o), kernel.dtype)
    for dxi in range(3):
        for jj in range(j):
            out = out.at[:, jj + dxi, :, jj, :].set(kernel[:, dxi])
    return out.reshape(3 * p * c, j * o)


def unband_grad(dwb: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(3*P*C, J*O) banded-weight cotangent -> (3, 3, C, O) kernel grad.

    Each kernel tap appears at J band positions; their cotangents sum.
    Off-band entries of dwb correspond to structural zeros and are
    (correctly) discarded.
    """
    p, j, c, o = plan.p, plan.j, plan.c, plan.o
    r = dwb.reshape(3, p, c, j, o)
    taps = []
    for dxi in range(3):
        taps.append(sum(r[:, jj + dxi, :, jj, :] for jj in range(j)))
    return jnp.stack(taps, axis=1)  # (3, 3, C, O)


def _build_a3(rows: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(BH+2, L) flat rows -> (BH, G, 3*P*C) banded activation tiles.

    Window g of row r is rows[r, g*J*C : g*J*C + P*C]; assembled from
    nparts unit-stride chunk slices of the (dim1, stride*chunk) reshape,
    then the three dy taps are the three row-shifted views stacked along
    the contraction dim.
    """
    bh2 = rows.shape[0]
    bh = bh2 - 2
    b4 = rows.reshape(bh2, plan.dim1, plan.stride * plan.chunk)
    parts = []
    for j in range(plan.nparts):
        r0 = j // plan.stride
        c0 = (j % plan.stride) * plan.chunk
        parts.append(
            jax.lax.slice(
                b4,
                (0, r0, c0),
                (bh2, r0 + plan.g, c0 + plan.chunk),
            )
        )
    a = jnp.concatenate(parts, axis=-1)  # (BH+2, G, P*C)
    return jnp.concatenate([a[0:bh], a[1:bh + 1], a[2:bh + 2]], axis=-1)


def _fwd_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, *, plan: Plan):
    rows = jnp.concatenate([x0_ref[0], x1_ref[0][:2]], axis=0)
    a3 = _build_a3(rows, plan)  # (BH, G, 3PC)
    acc = jax.lax.dot_general(
        a3, w_ref[...],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BH, G, J*O)
    acc = acc + b_ref[0].astype(jnp.float32)
    out = acc.reshape(plan.bh, plan.g * plan.j * plan.o)
    out_ref[0] = out[:, : plan.w * plan.o].astype(out_ref.dtype)


def _wgrad_kernel(x0_ref, x1_ref, g_ref, acc_ref, *, plan: Plan):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rows = jnp.concatenate([x0_ref[0], x1_ref[0][:2]], axis=0)
    a3 = _build_a3(rows, plan)  # (BH, G, 3PC)
    gg = g_ref[0]  # (BH, W*O)
    pad = plan.g * plan.j * plan.o - plan.w * plan.o
    if pad:
        gg = jnp.pad(gg, ((0, 0), (0, pad)))
    part = jax.lax.dot_general(
        a3.reshape(plan.bh * plan.g, 3 * plan.p * plan.c),
        gg.reshape(plan.bh * plan.g, plan.j * plan.o),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3PC, JO)
    acc_ref[...] += part


def _pad_flat(x: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(N,H,W,C) -> (N, H+BH, L) flat padded rows: 1 left pixel, right
    zeros to L; 1 top row, BH-1 bottom rows (1 real halo + block slack)."""
    n, h, w, c = x.shape
    xp = jnp.pad(
        x, ((0, 0), (1, plan.bh - 1), (1, plan.l // c - 1 - w), (0, 0))
    )
    return xp.reshape(n, h + plan.bh, plan.l)


def _fwd_call(x, wb, btile, plan: Plan, interpret: bool):
    n, h = x.shape[0], x.shape[1]
    xf = _pad_flat(x, plan)
    grid = (n, h // plan.bh)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j + 1, 0)),
            pl.BlockSpec((3 * plan.p * plan.c, plan.j * plan.o),
                         lambda i, j: (0, 0)),
            pl.BlockSpec((1, plan.j * plan.o), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, plan.bh, plan.w * plan.o),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, plan.w * plan.o), x.dtype),
        interpret=interpret,
    )(xf, xf, wb, btile).reshape(n, h, plan.w, plan.o)


def _wgrad_call(x, g, plan: Plan, interpret: bool):
    n, h = x.shape[0], x.shape[1]
    xf = _pad_flat(x, plan)
    gf = g.reshape(n, h, plan.w * plan.o)
    grid = (n, h // plan.bh)
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j + 1, 0)),
            pl.BlockSpec((1, plan.bh, plan.w * plan.o),
                         lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (3 * plan.p * plan.c, plan.j * plan.o), lambda i, j: (0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3 * plan.p * plan.c, plan.j * plan.o), jnp.float32
        ),
        interpret=interpret,
    )(xf, xf, gf)


def _rot_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """HWIO kernel of the transposed (dgrad) conv: spatial 180-rotation +
    in/out channel swap."""
    return jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)


def _direct_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _banded_conv(interpret: bool, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    wb = band_weights3(kernel, plan)
    btile = jnp.tile(bias, plan.j)[None]
    return _fwd_call(x, wb, btile, plan, interpret)


def _banded_conv_fwd(interpret, x, kernel, bias):
    return _banded_conv(interpret, x, kernel, bias), (x, kernel)


def _banded_conv_bwd(interpret, res, g):
    x, kernel = res
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    # dgrad: transposed conv == SAME conv of the cotangent with the
    # rotated, channel-swapped kernel; use the banded kernel when the
    # reverse (O->C) direction has a winning plan, else the XLA conv.
    krot = _rot_kernel(kernel).astype(g.dtype)
    rplan = plan_banded(plan.o, plan.c, plan.h, plan.w)
    if rplan is not None:
        wb = band_weights3(krot, rplan)
        zb = jnp.zeros((1, rplan.j * rplan.o), krot.dtype)
        dx = _fwd_call(g, wb, zb, rplan, interpret)
    else:
        dx = _direct_conv(g, krot)
    dwb = _wgrad_call(x, g.astype(x.dtype), plan, interpret)
    dk = unband_grad(dwb, plan).astype(kernel.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx.astype(x.dtype), dk, db


_banded_conv.defvjp(_banded_conv_fwd, _banded_conv_bwd)


def banded_conv3x3_pallas(x, kernel, bias=None, *, interpret: bool = False):
    """SAME stride-1 3x3 conv via in-VMEM banded matmuls.

    x: (N,H,W,C); kernel: (3,3,C,O) HWIO; bias: (O,) or None.
    Returns (N,H,W,O) in x.dtype. Requires plan_banded(...) is not None
    (caller-checked via `eligible`).
    """
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), x.dtype)
    return _banded_conv(interpret, x, kernel, bias.astype(x.dtype))


def eligible(x_shape, kernel_shape, strides=(1, 1)) -> bool:
    """True when this kernel both applies and beats the direct lowering."""
    if tuple(kernel_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    n, h, w, c = x_shape
    return plan_banded(c, kernel_shape[3], h, w) is not None
