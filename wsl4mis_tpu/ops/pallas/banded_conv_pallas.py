"""In-VMEM banded-matmul 3x3 convolution (Pallas TPU kernel).

Why (RESULTS.md round-2 roofline): the reference U-Net's channel widths
are 16/32 at the highest resolutions (/root/reference/code/networks/
unet.py:286-295). The MXU multiplies 128x128 tiles, so the direct lowering
pads the contraction 9C -> 128k and the output channels O -> 128; at C=16
that is ~7% tile occupancy and the padded-FLOP cost of the train step is
~4x its true FLOPs. ops/banded_conv.py re-expresses the conv as banded
matmuls with near-dense tiles, but its graph-level jnp formulation
materializes the regrouped activations in HBM and measured *slower*
(50 -> 213 ms/step, round-2 negative result). This kernel builds the
banded A-tiles **inside VMEM**, which is the whole trick.

Layout: flatten each padded row's (W, C) into one W*C lane vector and fix
the group width at J = 128/C output pixels, so a group's input window
(P = J+2 pixels = 128 + 2C lanes) starts exactly at lane 128*g. In-kernel
the only shape cast is (rows, L) -> (rows, L/128, 128) — an exact
128-lane split, the one relayout Mosaic supports (the first version used
a 96-lane split and was rejected by infer-vector-layout). Window pieces
are then:

  * nfull whole 128-lane blocks at unit-stride group offsets
    b5[:, f+g, :], f in 0..nfull-1;
  * a rem = 2C-lane tail at lane offset 0 of block g+nfull.

One (BH*G, 128) @ (128, J*O) dot per (dy, piece), f32-accumulated; the
three dy taps are row-shifted views of the same VMEM buffer. The three
dy tails merge lane-wise into one K=3*rem dot (WSL4MIS_BANDED_TAILS=split
falls back to three K=rem dots if the lane concat ever misbehaves).
For C=16, O=16 this is ~3.6x-padded FLOPs vs the direct lowering's ~14x.
The H halo comes from passing the input twice with block index maps (h)
and (h+1) — standard Pallas pipelining, no manual DMA.

Custom VJP: dgrad reuses the forward kernel with the rotated,
channel-swapped kernel (falling back to lax.conv when the reverse
direction has no winning plan); wgrad is a second kernel accumulating
dWb = A3^T @ g_grouped over the whole grid — a dense (3PC x M)@(M x JO)
matmul — with band entries extracted outside (each kernel tap appears at
J band positions; off-band cotangents correspond to structural zeros and
are discarded).

Semantics: SAME-padded, stride-1, cross-correlation with HWIO kernels —
identical (up to f32 accumulation order) to
lax.conv_general_dilated(x, k, (1,1), 'SAME', NHWC/HWIO), verified by
tests/test_banded_pallas.py in interpreter mode.
"""

from __future__ import annotations

import functools
import os
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
    j: int          # output pixels per group (J*C == 128*M)
    p: int          # input pixels per group (= j + 2)
    bh: int         # output rows per grid cell
    g: int          # groups per row
    nfull: int      # whole 128-lane blocks per window
    rem: int        # tail lanes per window (= 2C when < 128, else 0)
    l: int          # padded flat row length in lanes (= 128*K, K % M == 0)
    m: int = 1      # 128-lane blocks per group (window stride in blocks)

    @property
    def cost_per_pixel(self) -> float:
        n_hat = _ceil128(self.j * self.o)
        cost = 3 * self.nfull * 2 * 128 * n_hat
        if self.rem:
            cost += 2 * _ceil128(3 * self.rem) * n_hat
        return cost / self.j


def _direct_cost_per_pixel(c: int, o: int) -> float:
    return 2.0 * _ceil128(9 * c) * _ceil128(o)


def plan_banded(c: int, o: int, h: int, w: int) -> Plan | None:
    """Banded configuration for a (C,O,H,W) 3x3 conv, or None when the
    direct lowering is within 15% (C >= 128ish) or the shape doesn't
    block cleanly. J is fixed by J*C == 128 (see module docstring).

    c < 8 (the stem's 1-channel input, the 4-class head's dgrad) is
    admitted since round 4: the direct lowering of those shapes not only
    pads the contraction to 128 but also picks a W-minor layout
    ({2,3,1,0}) that forces full-tensor relayout copies against every
    default-layout neighbor — the round-4 HLO/trace join measured that
    family at ~3.2 ms of the 34.7 ms fully_supervised step. Gates:
    WSL4MIS_BANDED_SMALLC=0 restores the old 8 <= c bound and
    WSL4MIS_BANDED_DENSE=0 keeps M = 1; both knobs are part of the memo
    key so in-process env flips re-plan."""
    c_min = 1 if os.environ.get("WSL4MIS_BANDED_SMALLC", "1") != "0" else 8
    dense = os.environ.get("WSL4MIS_BANDED_DENSE", "1") != "0"
    return _plan_banded(c, o, h, w, c_min, dense)


def _cache_clear():  # test hook (kept name-compatible via attribute below)
    _plan_banded.cache_clear()


plan_banded.cache_clear = _cache_clear  # type: ignore[attr-defined]


def _plan_for_m(c: int, o: int, h: int, w: int, m: int) -> Plan | None:
    """Plan candidate with M 128-lane blocks per group (J = 128*M/C)."""
    j = 128 * m // c
    bh = None
    for cand in (32, 16, 8, 4, 2):
        if h % cand == 0:
            bh = cand
            break
    if bh is None or h < 2 or j > w:
        return None
    p = j + 2
    g = -(-w // j)
    if g < 2:
        return None
    window = p * c  # = 128*M + 2C
    nfull, rem = window // 128, window % 128
    # max block index used: full pieces (nfull-1) + M*(g-1); the rem tail
    # sits at block nfull + M*(g-1). K rounds up to a multiple of M so the
    # in-kernel (rows, K/M, M, 128) reshape is exact.
    blocks = m * (g - 1) + nfull + (1 if rem else 0)
    k = m * (-(-blocks // m))
    l = 128 * k
    plan = Plan(c, o, h, w, j, p, bh, g, nfull, rem, l, m)
    # VMEM guard: double-buffered row blocks + accumulator + weights
    vmem = (
        2 * 2 * (bh + 2) * l * 2
        + bh * g * _ceil128(j * o) * 4
        + 3 * window * j * o * 4
    )
    if vmem > 12 * 2 ** 20:
        return None
    if plan.cost_per_pixel > 0.85 * _direct_cost_per_pixel(c, o):
        return None
    return plan


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


@functools.lru_cache(maxsize=None)
def _plan_banded(c: int, o: int, h: int, w: int, c_min: int,
                 dense_ok: bool = True) -> Plan | None:
    if 128 % c or not (c_min <= c <= 128):
        return None
    base = _plan_for_m(c, o, h, w, 1)
    # Dense-output group width (round 4): M = C/gcd(C, O) makes J*O a
    # multiple of 128, so the grouped output has NO lane padding and is
    # byte-identical to the row-major 4D tensor (dense_chainable) — the
    # decoder's O < C convs then flat-chain too, and by the cost model a
    # wider window amortizes the halo (e.g. 32->16: 40960 -> 32768
    # padded-flops/pixel). WSL4MIS_BANDED_DENSE=0 keeps M = 1 (threaded
    # here as a memoized argument so in-process knob flips re-plan).
    if not dense_ok:
        return base
    m = c // _gcd(c, o)
    if m == 1:
        return base
    dense = _plan_for_m(c, o, h, w, m)
    if dense is None:
        return base
    if base is not None and dense.cost_per_pixel > base.cost_per_pixel:
        # wider window costs more compute than M=1: only worth it when it
        # unlocks dense chaining
        if not ((dense.j * dense.o) % 128 == 0 and dense.g * dense.j == w):
            return base
        if dense.cost_per_pixel > 1.3 * base.cost_per_pixel:
            return base
    return dense


def band_weights3(kernel: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(3, 3, C, O) HWIO -> (3*P*C, J*O) stacked banded matrix.

    Row layout matches the kernel's piece slicing: [dy=0 | dy=1 | dy=2]
    blocks of P*C rows; within a block, row (p*C + i) is input pixel
    offset p of the window, column (j*O + o) is output pixel j. The band
    is k[dy, p-j, i, o] for p-j in {0,1,2}. Static indices: the structure
    is a compile-time constant; values flow differentiably.
    """
    kh, kw, c, o = kernel.shape
    assert kh == 3 and kw == 3
    p, j = plan.p, plan.j
    # Static 0/1 selection masks S_dxi[p, jj] = (p == jj + dxi): the band
    # structure as three broadcasts instead of 3*J scatter ops (J can be
    # 128 for the c=1 stem conv; the loop formulation emitted 3*J HLO
    # scatters and dominated trace/compile time at small c).
    pi = jnp.arange(p)[:, None]
    jj = jnp.arange(j)[None, :]
    out = jnp.zeros((3, p, c, j, o), kernel.dtype)
    for dxi in range(3):
        mask = (pi == jj + dxi).astype(kernel.dtype)  # (p, j)
        out = out + (
            mask[None, :, None, :, None]
            * kernel[:, dxi][:, None, :, None, :]
        )
    return out.reshape(3 * p * c, j * o)


def unband_grad(dwb: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(3*P*C, J*O) banded-weight cotangent -> (3, 3, C, O) kernel grad."""
    p, j, c, o = plan.p, plan.j, plan.c, plan.o
    r = dwb.reshape(3, p, c, j, o)
    pi = jnp.arange(p)[:, None]
    jj = jnp.arange(j)[None, :]
    taps = []
    for dxi in range(3):
        mask = (pi == jj + dxi).astype(dwb.dtype)  # (p, j)
        # sum_j r[:, j+dxi, :, j, :] as a masked contraction over (p, j)
        taps.append(jnp.einsum("dpcjo,pj->dco", r, mask))
    return jnp.stack(taps, axis=1)  # (3, 3, C, O)


def _merge_tails() -> bool:
    return os.environ.get("WSL4MIS_BANDED_TAILS", "merged") != "split"


def _blocked(rows, plan: Plan):
    """(rows, L) -> blocked view for piece slicing: (rows, K, 128) when
    M == 1, (rows, K/M, M, 128) when M > 1 (block f + M*g of window piece
    f lives at [.., f//M + g, f%M, :] — fixed parity per piece, so every
    slice is unit-stride)."""
    r = rows.shape[0]
    if plan.m == 1:
        return rows.reshape(r, plan.l // 128, 128)
    return rows.reshape(r, plan.l // (128 * plan.m), plan.m, 128)


def _piece(b, plan: Plan, dy: int, f: int, width: int):
    """Window piece f (block granularity; f == plan.nfull is the rem
    tail): the (BH, G, width<=128) activation slab for row offset dy."""
    bh, g = plan.bh, plan.g
    if plan.m == 1:
        return b[dy:dy + bh, f:f + g, :width]
    q, r = divmod(f, plan.m)
    return b[dy:dy + bh, q:q + g, r, :width]


def _window_pieces(b, plan: Plan):
    """Yield (a_block, wb_row_offset, k_width) pieces of the banded
    activation: per dy, nfull unit-stride 128-lane blocks and (handled by
    the caller) the rem-lane tail."""
    for dy in range(3):
        base = dy * plan.p * plan.c
        for f in range(plan.nfull):
            yield (
                _piece(b, plan, dy, f, 128),
                base + f * 128,
                128,
            )


def _acc_conv(x0_ref, x1_ref, w_ref, plan: Plan):
    """Shared fwd contraction: (BH, G, Nhat) f32 accumulator."""
    bh, g = plan.bh, plan.g
    rows = jnp.concatenate([x0_ref[0], x1_ref[0][:2]], axis=0)
    b5 = _blocked(rows, plan)
    n = _ceil128(plan.j * plan.o)
    acc = jnp.zeros((bh, g, n), jnp.float32)
    for a, row0, width in _window_pieces(b5, plan):
        acc = acc + jax.lax.dot_general(
            a, w_ref[row0:row0 + width, :],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if plan.rem:
        tails = [
            _piece(b5, plan, dy, plan.nfull, plan.rem)
            for dy in range(3)
        ]
        wt = [
            w_ref[dy * plan.p * plan.c + plan.nfull * 128:
                  dy * plan.p * plan.c + plan.nfull * 128 + plan.rem, :]
            for dy in range(3)
        ]
        if _merge_tails():
            acc = acc + jax.lax.dot_general(
                jnp.concatenate(tails, axis=-1),
                jnp.concatenate(wt, axis=0),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            for t, wpiece in zip(tails, wt):
                acc = acc + jax.lax.dot_general(
                    t, wpiece, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    return acc


def _halo_spec(plan: Plan):
    """Block spec for the 2 halo rows below each row block.

    The original formulation passed the input a second time with the SAME
    BH-row block shape shifted by one block — the kernel reads only 2 of
    those rows, but the block is the DMA unit, so every input byte moved
    twice (round-5 DMA audit: the fwd kernel was ~2x input-bound).
    Mosaic's minimum sublane block is 8, so when BH % 8 == 0 the halo
    pass fetches an 8-row block at element offset (j+1)*BH (block index
    (j+1)*BH/8), cutting the second pass to BH/8 of the tensor; smaller
    BH keeps the legacy full-BH second pass. The kernels read x1[0][:2]
    either way."""
    if plan.bh % 8 == 0:
        return pl.BlockSpec(
            (1, 8, plan.l), lambda i, j: (i, (j + 1) * (plan.bh // 8), 0)
        )
    return pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j + 1, 0))


def _fwd_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, *, plan: Plan):
    # The accumulator/output stay 3-D (BH, G, Nhat) with Nhat 128-padded:
    # Mosaic rejects lane-collapsing reshapes like (BH, G, 64)->(BH, G*64)
    # (infer-vector-layout "unsupported shape cast", hit on the 32->16
    # decoder conv); the wrapper does the slice+flatten in XLA where it
    # fuses into the consumer.
    acc = _acc_conv(x0_ref, x1_ref, w_ref, plan)
    acc = acc + b_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _fwd_stats_kernel(
    x0_ref, x1_ref, w_ref, b_ref, out_ref, st_ref, *, plan: Plan
):
    """Forward + per-lane channel-moment partials in the epilogue.

    st_ref is a (2, Nhat) f32 grid accumulator: row 0 sums y, row 1 sums
    y*y over all (batch, row-block) grid cells — computed from the
    ROUNDED output values so the moments are bit-comparable to an XLA
    reduce over the stored y (FusedBatchNorm's f32-stats contract). Lanes
    belonging to right-edge pixel padding (group*J + lane//O >= W) are
    masked out; weight/bias lane padding contributes exact zeros anyway.
    The wrapper folds (Nhat,) -> (J, O) -> (O,) in XLA (lane-collapsing
    reshapes don't lower in Mosaic).
    """
    acc = _acc_conv(x0_ref, x1_ref, w_ref, plan)
    acc = acc + b_ref[0].astype(jnp.float32)
    y = acc.astype(out_ref.dtype)
    out_ref[0] = y
    bh, g = plan.bh, plan.g
    n = _ceil128(plan.j * plan.o)
    gi = jax.lax.broadcasted_iota(jnp.int32, (bh, g, n), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (bh, g, n), 2)
    real = (gi * plan.j + li // plan.o) < plan.w
    yf = jnp.where(real, y.astype(jnp.float32), 0.0)
    # stay 2-D end to end (1-D vectors and stack/new-axis concats are
    # Mosaic lowering hazards on this backend — see maxpool_pallas.py)
    s1 = jnp.sum(jnp.sum(yf, axis=0), axis=0, keepdims=True)        # (1, N)
    s2 = jnp.sum(jnp.sum(yf * yf, axis=0), axis=0, keepdims=True)   # (1, N)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        st_ref[...] = jnp.zeros_like(st_ref)

    st_ref[0:1, :] += s1
    st_ref[1:2, :] += s2


def _wgrad_kernel(x0_ref, x1_ref, g_ref, acc_ref, *, plan: Plan):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bh, g, n = plan.bh, plan.g, _ceil128(plan.j * plan.o)
    rows = jnp.concatenate([x0_ref[0], x1_ref[0][:2]], axis=0)
    b5 = _blocked(rows, plan)
    # cotangent arrives pre-grouped and lane-padded (BH, G, Nhat) from the
    # wrapper (the in-kernel lane split (BH, G*n)->(BH*G, n) is the same
    # unsupported cast class as the fwd flatten); collapsing the leading
    # dims keeps the 128-lane minor intact.
    gg = g_ref[0].reshape(bh * g, n).astype(b5.dtype)
    for a, row0, width in _window_pieces(b5, plan):
        part = jax.lax.dot_general(
            a.reshape(bh * g, width), gg,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (width, N)
        acc_ref[row0:row0 + width, :] += part
    if plan.rem:
        for dy in range(3):
            t = _piece(b5, plan, dy, plan.nfull, plan.rem)
            part = jax.lax.dot_general(
                t.reshape(bh * g, plan.rem), gg,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            row0 = dy * plan.p * plan.c + plan.nfull * 128
            acc_ref[row0:row0 + plan.rem, :] += part


def _pad_flat(x: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """(N,H,W,C) -> (N, H+BH, L) flat padded rows: 1 left pixel, right
    zeros to L lanes; 1 top row, BH-1 bottom rows (halo + block slack)."""
    n, h, w, c = x.shape
    xp = jnp.pad(
        x, ((0, 0), (1, plan.bh - 1), (1, plan.l // c - 1 - w), (0, 0))
    )
    return xp.reshape(n, h + plan.bh, plan.l)


def _fwd_call(x, wb, btile, plan: Plan, interpret: bool):
    return _fwd_call_padded(_pad_flat(x, plan), wb, btile, plan, interpret)


def _fwd_call_padded(xf, wb, btile, plan: Plan, interpret: bool):
    """wb: (3PC, Nhat) lane-padded banded weights; btile: (1, Nhat);
    xf: _pad_flat output (shared with wgrad via the VJP residual so the
    pad isn't re-materialized in the backward pass)."""
    n, h = xf.shape[0], xf.shape[1] - plan.bh
    nhat = _ceil128(plan.j * plan.o)
    grid = (n, h // plan.bh)
    out4 = pl.pallas_call(
        functools.partial(_fwd_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            _halo_spec(plan),
            pl.BlockSpec((3 * plan.p * plan.c, nhat), lambda i, j: (0, 0)),
            pl.BlockSpec((1, nhat), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, plan.bh, plan.g, nhat),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, plan.g, nhat), xf.dtype),
        interpret=interpret,
    )(xf, xf, wb, btile)
    # XLA-side unpack (fuses into the consumer): drop the lane padding,
    # flatten groups, drop the right-edge pixel padding.
    y = out4[..., : plan.j * plan.o].reshape(
        n, h, plan.g * plan.j, plan.o
    )
    return y[:, :, : plan.w, :]


def _fwd_stats_call_raw(xf, wb, btile, plan: Plan, interpret: bool):
    """Forward+moments, returning the RAW grouped (N, H, G, Nhat) output
    (no unpack) plus (O,) f32 moments."""
    n, h = xf.shape[0], xf.shape[1] - plan.bh
    nhat = _ceil128(plan.j * plan.o)
    grid = (n, h // plan.bh)
    out4, st = pl.pallas_call(
        functools.partial(_fwd_stats_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            _halo_spec(plan),
            pl.BlockSpec((3 * plan.p * plan.c, nhat), lambda i, j: (0, 0)),
            pl.BlockSpec((1, nhat), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, plan.bh, plan.g, nhat),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, nhat), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, plan.g, nhat), xf.dtype),
            jax.ShapeDtypeStruct((2, nhat), jnp.float32),
        ],
        interpret=interpret,
    )(xf, xf, wb, btile)
    # (Nhat,) lanes -> (J, O) -> (O,): trivial XLA-side fold
    moments = st[:, : plan.j * plan.o].reshape(2, plan.j, plan.o).sum(1)
    return out4, moments[0], moments[1]


def _unpack4(out4, plan: Plan):
    """Grouped (N, H, G, Nhat) kernel output -> 4D (N, H, W, O)."""
    n, h = out4.shape[0], out4.shape[1]
    y = out4[..., : plan.j * plan.o].reshape(
        n, h, plan.g * plan.j, plan.o
    )
    return y[:, :, : plan.w, :]


def _fwd_stats_call_padded(xf, wb, btile, plan: Plan, interpret: bool):
    """Like _fwd_call_padded but the kernel also accumulates per-lane
    channel moments; returns (y, s1, s2) with s1/s2 shaped (O,) f32."""
    out4, s1, s2 = _fwd_stats_call_raw(xf, wb, btile, plan, interpret)
    return _unpack4(out4, plan), s1, s2


def dense_chainable(plan: Plan | None) -> bool:
    """True when the kernel's grouped (N, H, G, Nhat) output is BYTE-
    IDENTICAL to the row-major 4D (N, H, W, O) tensor: no lane padding
    (J*O a multiple of 128) and no right-edge pixel padding (G*J == W).
    Such outputs can chain straight into the next banded conv without the
    unpack-slice / re-pad / XLA-layout round trip (round-4 trace: those
    seams — H-minor fusion relayouts + pad copies — cost more than the
    pool itself)."""
    return (
        plan is not None
        and (plan.j * plan.o) % 128 == 0
        and plan.g * plan.j == plan.w
    )


def _pad_flat_grouped(xg: jnp.ndarray, plan: Plan) -> jnp.ndarray:
    """Grouped dense (N, H, G0, N0) view (== row-major (N, H, W, C)) ->
    the consumer's _pad_flat layout, via one dense-lane pad (no 4D
    detour, so XLA cannot interpose a W-/H-minor layout island)."""
    n, h, g0, n0 = xg.shape
    flat = xg.reshape(n, h, g0 * n0)
    return jnp.pad(
        flat,
        ((0, 0), (1, plan.bh - 1), (plan.c, plan.l - plan.c - g0 * n0)),
    )


def _group_cotangent(g_arr, plan: Plan):
    """(N,H,W,O) cotangent -> (N,H,G,Nhat) grouped + lane-padded."""
    n, h = g_arr.shape[0], g_arr.shape[1]
    nn = plan.j * plan.o
    gf = jnp.pad(
        g_arr.reshape(n, h, plan.w * plan.o),
        ((0, 0), (0, 0), (0, plan.g * nn - plan.w * plan.o)),
    ).reshape(n, h, plan.g, nn)
    return jnp.pad(
        gf, ((0, 0), (0, 0), (0, 0), (0, _ceil128(nn) - nn))
    )


def _wgrad_call(xf, g, plan: Plan, interpret: bool):
    """xf: pre-padded flat rows (the forward's _pad_flat, reused)."""
    n, h = xf.shape[0], xf.shape[1] - plan.bh
    nhat = _ceil128(plan.j * plan.o)
    gf = _group_cotangent(g, plan)
    grid = (n, h // plan.bh)
    dwb = pl.pallas_call(
        functools.partial(_wgrad_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            _halo_spec(plan),
            pl.BlockSpec((1, plan.bh, plan.g, nhat),
                         lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (3 * plan.p * plan.c, nhat), lambda i, j: (0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3 * plan.p * plan.c, nhat), jnp.float32
        ),
        interpret=interpret,
    )(xf, xf, gf)
    return dwb[:, : plan.j * plan.o]


def _wgrad_call_grouped(xf, gg, plan: Plan, interpret: bool):
    """_wgrad_call for a cotangent that ALREADY lives in the grouped
    (N, H, G, Nhat) layout (flat-chained blocks): skips _group_cotangent's
    pad+reshape entirely."""
    n, h = xf.shape[0], xf.shape[1] - plan.bh
    nhat = _ceil128(plan.j * plan.o)
    grid = (n, h // plan.bh)
    dwb = pl.pallas_call(
        functools.partial(_wgrad_kernel, plan=plan),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, plan.bh, plan.l), lambda i, j: (i, j, 0)),
            _halo_spec(plan),
            pl.BlockSpec((1, plan.bh, plan.g, nhat),
                         lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (3 * plan.p * plan.c, nhat), lambda i, j: (0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3 * plan.p * plan.c, nhat), jnp.float32
        ),
        interpret=interpret,
    )(xf, xf, gg)
    return dwb[:, : plan.j * plan.o]


def _rot_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """HWIO kernel of the transposed (dgrad) conv: spatial 180-rotation +
    in/out channel swap."""
    return jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)


def _direct_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _pad_n(arr2d, plan: Plan):
    nn = plan.j * plan.o
    return jnp.pad(arr2d, ((0, 0), (0, _ceil128(nn) - nn)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _banded_conv(interpret: bool, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    return _fwd_call(x, wb, btile, plan, interpret)


def _banded_conv_fwd(interpret, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    xf = _pad_flat(x, plan)
    out = _fwd_call_padded(xf, wb, btile, plan, interpret)
    # residual is the PADDED flat rows: the wgrad kernel consumes the same
    # layout, so the backward pass skips a full-tensor re-pad+reshape
    # (~1 ms/step of "data formatting" in the round-3 trace).
    return out, (xf, kernel)


def _conv_bwd_core(interpret, xf, kernel, g):
    c, o = kernel.shape[2], kernel.shape[3]
    plan = plan_banded(c, o, g.shape[1], g.shape[2])
    krot = _rot_kernel(kernel).astype(g.dtype)
    rplan = plan_banded(plan.o, plan.c, plan.h, plan.w)
    if rplan is not None:
        wb = _pad_n(band_weights3(krot, rplan), rplan)
        zb = jnp.zeros((1, _ceil128(rplan.j * rplan.o)), krot.dtype)
        dx = _fwd_call(g, wb, zb, rplan, interpret)
    else:
        dx = _direct_conv(g, krot)
    dwb = _wgrad_call(xf, g.astype(xf.dtype), plan, interpret)
    dk = unband_grad(dwb, plan).astype(kernel.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx.astype(xf.dtype), dk, db


def _banded_conv_bwd(interpret, res, g):
    xf, kernel = res
    return _conv_bwd_core(interpret, xf, kernel, g)


_banded_conv.defvjp(_banded_conv_fwd, _banded_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _banded_conv_stats(interpret: bool, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    return _fwd_stats_call_padded(
        _pad_flat(x, plan), wb, btile, plan, interpret
    )


def _banded_conv_stats_fwd(interpret, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], x.shape[2])
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    xf = _pad_flat(x, plan)
    y, s1, s2 = _fwd_stats_call_padded(xf, wb, btile, plan, interpret)
    # y is also the BN-apply operand downstream, so XLA already keeps the
    # buffer alive for the step's backward; saving it here aliases that.
    return (y, s1, s2), (xf, kernel, y)


def _banded_conv_stats_bwd(interpret, res, cts):
    xf, kernel, y = res
    gy, gs1, gs2 = cts
    # fold the moment cotangents into the output cotangent:
    # d s1 / dy = 1, d s2 / dy = 2y  (per channel), then one shared core.
    g32 = gy.astype(jnp.float32)
    g32 = g32 + gs1[None, None, None, :]
    g32 = g32 + 2.0 * y.astype(jnp.float32) * gs2[None, None, None, :]
    return _conv_bwd_core(interpret, xf, kernel, g32.astype(gy.dtype))


_banded_conv_stats.defvjp(_banded_conv_stats_fwd, _banded_conv_stats_bwd)


# ---------------------------------------------------------------------------
# Flat-chained variants (round 4). Producer emits the RAW grouped
# (N, H, G, Nhat) tensor — byte-identical to 4D when dense_chainable —
# so BN apply / LeakyReLU / dropout run on dense 128-lane rows and the
# consumer conv re-pads with ONE lane pad instead of the 4D unpack-slice
# + re-pad + XLA H-/W-minor layout round trip.
# ---------------------------------------------------------------------------


def _tile_lane(v, plan: Plan):
    """(O,) f32 -> (Nhat,) per-lane vector (tiled over J; zero lane pad)."""
    t = jnp.tile(v, plan.j)
    return _pad_n(t[None], plan)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _banded_conv_stats_gout(interpret: bool, w: int, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    return _fwd_stats_call_raw(_pad_flat(x, plan), wb, btile, plan, interpret)


def _banded_conv_stats_gout_fwd(interpret, w, x, kernel, bias):
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    xf = _pad_flat(x, plan)
    yg, s1, s2 = _fwd_stats_call_raw(xf, wb, btile, plan, interpret)
    return (yg, s1, s2), (xf, kernel, yg)


def _dgrad_from_grouped(interpret, gg, kernel, plan: Plan):
    """dgrad conv(g, rot(kernel)) for a cotangent gg that lives in the
    DENSE grouped layout (requires dense_chainable(plan), so gg's bytes
    are the row-major (N,H,W,O) tensor). The dgrad kernel input is built
    with ONE dense-lane pad (_pad_flat_grouped) instead of the 4D
    unpack -> pad -> reshape detour, whose tiled-layout copies the round-5
    trace billed at ~0.2 ms per chained block in the backward. Bit-exact:
    both constructions place identical zeros at identical lanes."""
    n, h = gg.shape[0], gg.shape[1]
    krot = _rot_kernel(kernel).astype(gg.dtype)
    rplan = plan_banded(plan.o, plan.c, h, plan.w)
    if rplan is None:
        return _direct_conv(_unpack4(gg, plan), krot)
    wbr = _pad_n(band_weights3(krot, rplan), rplan)
    zb = jnp.zeros((1, _ceil128(rplan.j * rplan.o)), krot.dtype)
    gfx = _pad_flat_grouped(gg, rplan)
    return _fwd_call_padded(gfx, wbr, zb, rplan, interpret)


def _db_from_grouped(gg, plan: Plan):
    """Bias cotangent (O,) from a dense grouped cotangent: the lane dim
    packs (J pixels x O channels), so fold lanes as (J, O) and sum."""
    s = jnp.sum(gg.astype(jnp.float32), axis=(0, 1, 2))
    return s.reshape(plan.j, plan.o).sum(0)


def _banded_conv_stats_gout_bwd(interpret, w, res, cts):
    xf, kernel, yg = res
    gyg, gs1, gs2 = cts
    c, o = kernel.shape[2], kernel.shape[3]
    h = yg.shape[1]
    plan = plan_banded(c, o, h, w)
    g32 = gyg.astype(jnp.float32)
    g32 = g32 + _tile_lane(gs1, plan)
    g32 = g32 + 2.0 * yg.astype(jnp.float32) * _tile_lane(gs2, plan)
    gg = g32.astype(xf.dtype)
    # gout's contract guarantees dense_chainable(plan): dgrad straight
    # from the grouped cotangent, no 4D round trip
    dx = _dgrad_from_grouped(interpret, gg, kernel, plan)
    dwb = _wgrad_call_grouped(xf, gg, plan, interpret)
    dk = unband_grad(dwb, plan).astype(kernel.dtype)
    db = _db_from_grouped(gg, plan).astype(gg.dtype)
    return dx.astype(xf.dtype), dk, db


_banded_conv_stats_gout.defvjp(
    _banded_conv_stats_gout_fwd, _banded_conv_stats_gout_bwd
)


# ---- grouped-in AND grouped-out (round 5): conv whose input arrives as
# a dense flat tensor (previous flat-chained block, pooled in the flat
# domain) and whose output feeds the next flat consumer. No 4D tensor
# exists on either side, so XLA has no seam at which to interpose its
# small-C W-/H-minor tiled layouts (the round-5 trace/HLO join billed
# each such seam 0.2-0.4 ms in pad/reshape/copy).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _banded_conv_stats_gio(interpret: bool, w: int, g0n0, xg, kernel, bias):
    plan = plan_banded(kernel.shape[2], kernel.shape[3], xg.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    return _fwd_stats_call_raw(
        _pad_flat_grouped(xg, plan), wb, btile, plan, interpret
    )


def _banded_conv_stats_gio_fwd(interpret, w, g0n0, xg, kernel, bias):
    plan = plan_banded(kernel.shape[2], kernel.shape[3], xg.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    xf = _pad_flat_grouped(xg, plan)
    yg, s1, s2 = _fwd_stats_call_raw(xf, wb, btile, plan, interpret)
    return (yg, s1, s2), (xf, kernel, yg)


def _banded_conv_stats_gio_bwd(interpret, w, g0n0, res, cts):
    xf, kernel, yg = res
    gyg, gs1, gs2 = cts
    c, o = kernel.shape[2], kernel.shape[3]
    h = yg.shape[1]
    plan = plan_banded(c, o, h, w)
    g32 = gyg.astype(jnp.float32)
    g32 = g32 + _tile_lane(gs1, plan)
    g32 = g32 + 2.0 * yg.astype(jnp.float32) * _tile_lane(gs2, plan)
    gg = g32.astype(xf.dtype)
    dx = _dgrad_from_grouped(interpret, gg, kernel, plan)
    dwb = _wgrad_call_grouped(xf, gg, plan, interpret)
    dk = unband_grad(dwb, plan).astype(kernel.dtype)
    db = _db_from_grouped(gg, plan).astype(gg.dtype)
    # the producer side is dense flat, so the 4D dx's row-major bytes ARE
    # the grouped input cotangent
    dx = dx.astype(xf.dtype)
    return dx.reshape(dx.shape[0], dx.shape[1], *g0n0), dk, db


_banded_conv_stats_gio.defvjp(
    _banded_conv_stats_gio_fwd, _banded_conv_stats_gio_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _banded_conv_stats_gin(interpret: bool, w: int, g0n0, xg, kernel, bias):
    plan = plan_banded(kernel.shape[2], kernel.shape[3], xg.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    return _fwd_stats_call_padded(
        _pad_flat_grouped(xg, plan), wb, btile, plan, interpret
    )


def _banded_conv_stats_gin_fwd(interpret, w, g0n0, xg, kernel, bias):
    plan = plan_banded(kernel.shape[2], kernel.shape[3], xg.shape[1], w)
    wb = _pad_n(band_weights3(kernel, plan), plan)
    btile = _pad_n(jnp.tile(bias, plan.j)[None], plan)
    xf = _pad_flat_grouped(xg, plan)
    y, s1, s2 = _fwd_stats_call_padded(xf, wb, btile, plan, interpret)
    return (y, s1, s2), (xf, kernel, y)


def _banded_conv_stats_gin_bwd(interpret, w, g0n0, res, cts):
    xf, kernel, y = res
    gy, gs1, gs2 = cts
    g32 = gy.astype(jnp.float32)
    g32 = g32 + gs1[None, None, None, :]
    g32 = g32 + 2.0 * y.astype(jnp.float32) * gs2[None, None, None, :]
    dx, dk, db = _conv_bwd_core(interpret, xf, kernel, g32.astype(gy.dtype))
    # the producer was dense_chainable, so the 4D cotangent's row-major
    # bytes ARE the grouped cotangent
    return dx.reshape(dx.shape[0], dx.shape[1], *g0n0), dk, db


_banded_conv_stats_gin.defvjp(
    _banded_conv_stats_gin_fwd, _banded_conv_stats_gin_bwd
)


def banded_conv3x3_pallas_stats_grouped_out(x, kernel, bias=None, *,
                                            interpret: bool = False):
    """Conv + moments emitting the RAW grouped (N, H, G, Nhat) output for
    flat chaining. Requires dense_chainable(plan). The grouped tensor is
    byte-identical to the 4D (N, H, W, O) output (tested), so elementwise
    consumers may treat lane l of group g as (w, o) = (g*J + l//O, l%O)."""
    w = x.shape[2]
    plan = plan_banded(x.shape[3], kernel.shape[3], x.shape[1], w)
    assert dense_chainable(plan), (x.shape, kernel.shape)
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), x.dtype)
    return _banded_conv_stats_gout(
        interpret, w, x, kernel, bias.astype(x.dtype)
    )


def banded_conv3x3_pallas_stats_grouped_in(xg, w, kernel, bias=None, *,
                                           interpret: bool = False):
    """Conv + moments consuming a grouped dense (N, H, G0, N0) input
    (the previous conv's grouped output after elementwise BN/act/dropout);
    w is the logical pixel width (G0*N0 == w * C). Returns the standard
    4D (y, s1, s2)."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), xg.dtype)
    return _banded_conv_stats_gin(
        interpret, w, tuple(xg.shape[2:]), xg, kernel, bias.astype(xg.dtype)
    )


def banded_conv3x3_pallas_stats_grouped_io(xg, w, kernel, bias=None, *,
                                           interpret: bool = False):
    """Conv + moments consuming a grouped/flat dense (N, H, G0, N0) input
    AND emitting the RAW grouped (N, H, G, Nhat) output (dense_chainable
    required on the output plan). w is the logical pixel width
    (G0*N0 == w * C). The fully-flat variant for encoder stages whose
    pool seam also runs in the flat domain (ops/maxpool.py
    max_pool_2x2_flat)."""
    plan = plan_banded(kernel.shape[2], kernel.shape[3], xg.shape[1], w)
    assert dense_chainable(plan), (xg.shape, kernel.shape)
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), xg.dtype)
    return _banded_conv_stats_gio(
        interpret, w, tuple(xg.shape[2:]), xg, kernel, bias.astype(xg.dtype)
    )


def banded_conv3x3_pallas(x, kernel, bias=None, *, interpret: bool = False):
    """SAME stride-1 3x3 conv via in-VMEM banded matmuls.

    x: (N,H,W,C); kernel: (3,3,C,O) HWIO; bias: (O,) or None.
    Returns (N,H,W,O) in x.dtype. Requires plan_banded(...) is not None
    (caller-checked via `eligible`).
    """
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), x.dtype)
    return _banded_conv(interpret, x, kernel, bias.astype(x.dtype))


def banded_conv3x3_pallas_stats(x, kernel, bias=None, *,
                                interpret: bool = False):
    """Conv + per-channel output moments in one kernel pass.

    Returns (y, s1, s2): y as banded_conv3x3_pallas; s1[o] = sum(y[..,o]),
    s2[o] = sum(y[..,o]^2), both f32 over the ROUNDED stored values —
    bit-comparable to an f32 XLA reduce over y (FusedBatchNorm's stats),
    but computed in the conv epilogue while the tile is still in VMEM, so
    BatchNorm needs no separate full-tensor stats read. The VJP folds the
    moment cotangents into dy (exact: 1 and 2y) and reuses the conv
    backward. Reference parity: the moments feed BatchNorm2d exactly as
    torch's running stats pipeline does (reference
    /root/reference/code/networks/unet.py:20-24)."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), x.dtype)
    return _banded_conv_stats(interpret, x, kernel, bias.astype(x.dtype))


def eligible(x_shape, kernel_shape, strides=(1, 1)) -> bool:
    """True when this kernel both applies and beats the direct lowering.

    WSL4MIS_BANDED_ROUTE selects the win predicate:
      * "cost" (default) — the padded-FLOP model in plan_banded (>=15%
        modelled saving).
      * "measured" — additionally require C <= 32 and min(H, W) >= 128:
        the round-3 conv-shaped microbench (scripts/bench_conv.py,
        RESULTS.md "Conv-shaped ceiling") measured the direct lowering
        FASTER despite its padding for every >=64-channel or <=64x64
        shape (64->64@64x64: 53.3 vs 46.9 TF/s; 32->64@64x64: 36.5 vs
        28.5; 64->32@128x128: 24.7 vs 16.7) — the banded kernel's edge
        is the small-C big-HW regime where lane padding is worst. Gating
        on min(H, W) keeps a non-square (tall-narrow) input out of a
        regime the microbench never measured.
    """
    if tuple(kernel_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    n, h, w, c = x_shape
    if plan_banded(c, kernel_shape[3], h, w) is None:
        return False
    if os.environ.get("WSL4MIS_BANDED_ROUTE", "cost") == "measured":
        return c <= 32 and min(h, w) >= 128
    return True
