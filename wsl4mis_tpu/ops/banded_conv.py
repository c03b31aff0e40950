"""Banded-matmul 3x3 convolution for small channel counts (TPU MXU).

Why: the reference U-Net's channel widths are 16/32 at the highest
resolutions (unet.py:286-295). The MXU multiplies 128x128 tiles, so a
direct lowering pads the output-channel dim 16->128 (8x idle lanes) and
the contraction 144->256; the padded-FLOP cost of the step is ~4x its true
FLOPs (RESULTS.md round-2 roofline). This module re-expresses the conv so
the MXU tiles are nearly dense:

  * pack P=8 consecutive input pixels x C channels into the contraction
    dim (K = 8C: 128 for C=16), and J=6 consecutive output pixels x C
    channels into the output dim (N = 6C: 96 for C=16);
  * the weight becomes a banded (8C x 6C) matrix per vertical tap dy:
    W_band[dy][p*C+i, j*C+o] = k[dy, p-j, i, o] for p-j in {0,1,2}
    (dx = p-1-j in {-1,0,1}), zero outside the band;
  * the input is rearranged once into overlapping 8-pixel groups of
    stride 6 (strided slices, no gather), shared by all three dy taps:
    A[n, h, g, p*C+i] = x_pad[n, h, 6g+p, i];
  * out[n, h, 6g+j, o] = sum_dy A[n, h+dy] @ W_band[dy], reshaped back.

Per-group MXU work is 8C x 6C vs the direct lowering's 128-padded tiles:
for C=16 the band occupies 37.5% of the tile vs ~7-12% padded — ~3-4x
fewer padded FLOPs. Everything is plain jnp (strided slices + matmuls),
so XLA differentiates it: dgrad flows through the matmul transpose
(N = 8C lanes, dense) and the strided-slice adjoint (pad-add), and wgrad
is a (8C x M) @ (M x 6C) contraction over all pixels — all lane-dense.

Semantics: SAME-padded, stride-1, cross-correlation with HWIO kernels —
identical (up to f32 accumulation order) to
lax.conv_general_dilated(x, k, (1,1), 'SAME', NHWC/HWIO).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

P = 8  # input pixels per group (K = P*C)
J = 6  # output pixels per group (N = J*C); P = J + 2 halo


def band_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) HWIO -> (3, P*C, J*O) banded matrices (one per dy).

    Built with a static numpy mask so the band structure is a compile-time
    constant; the kernel values flow through differentiably.
    """
    kh, kw, c, o = kernel.shape
    assert kh == 3 and kw == 3, "banded path is for 3x3 kernels"
    # scatter k[dy, dx, i, o] into [dy, (p, i), (j, o)] at p = j + dx' where
    # dx' = dx index in 0..2  (p - j = dx_index)
    out = jnp.zeros((3, P * c, J * o), kernel.dtype)
    for dxi in range(3):
        for jj in range(J):
            p = jj + dxi  # band position: p - j = dx index
            out = out.at[
                :, p * c: (p + 1) * c, jj * o: (jj + 1) * o
            ].set(kernel[:, dxi])
    return out


def _regroup(x_pad: jnp.ndarray, groups: int, c: int) -> jnp.ndarray:
    """(N, Hp, Wp, C) -> (N, Hp, G, P*C) overlapping stride-J pixel groups."""
    segs = []
    for p in range(P):
        seg = jax.lax.slice_in_dim(
            x_pad, p, p + J * (groups - 1) + 1, stride=J, axis=2
        )
        segs.append(seg)
    return jnp.concatenate(segs, axis=-1)  # (N, Hp, G, P*C)


def banded_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None,
                   accum_dtype=jnp.float32) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv via banded matmuls. x: (N,H,W,C) -> (N,H,W,O)."""
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    groups = -(-w // J)  # ceil: output pixels covered = groups*J >= W
    # input width needed: 6*(G-1)+7 around [-1, ...] => pad left 1,
    # right so padded width >= P + J*(groups-1)
    wp = P + J * (groups - 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp - 1 - w), (0, 0)))
    a = _regroup(x_pad, groups, c)  # (N, H+2, G, P*C)
    wb = band_weights(kernel)       # (3, P*C, J*O)
    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            a[:, dy: dy + h],
            wb[dy],
            (((3,), (0,)), ((), ())),
            preferred_element_type=accum_dtype,
        )  # (N, H, G, J*O)
        acc = part if acc is None else acc + part
    out = acc.reshape(n, h, groups * J, o)[:, :, :w, :]
    if bias is not None:
        out = out + bias.astype(accum_dtype)
    return out.astype(x.dtype)


def small_channel_eligible(kernel_shape, strides=(1, 1),
                           max_out: int = 32) -> bool:
    """The shapes where the banded path beats the direct lowering."""
    return (
        tuple(kernel_shape[:2]) == (3, 3)
        and tuple(strides) == (1, 1)
        and kernel_shape[3] <= max_out
    )
