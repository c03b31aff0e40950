"""2D U-Net family (Flax/linen, NHWC, bf16-capable).

Architectural parity with /root/reference/code/networks/unet.py:
  * ConvBlock = [Conv3x3 -> BN -> LeakyReLU(0.01) -> Dropout(p) ->
    Conv3x3 -> BN -> LeakyReLU] (unet.py:13-29);
  * encoder channels [16, 32, 64, 128, 256], dropout
    [0.05, 0.1, 0.2, 0.3, 0.5], maxpool-2 downsampling (unet.py:71-98,
    286-295); decoder ConvTranspose(k=2,s=2) upsampling, skip concat,
    dropout 0, 3x3 output head (unet.py:101-135);
  * UNet_DS adds per-scale 3x3 heads nearest-resized to the input
    resolution (unet.py:138-188);
  * UNet_CCT adds an auxiliary decoder fed channel-dropout'ed encoder
    features (unet.py:327-346) — the DMPLS dual branch;
  * UNet_CCT_3H adds a third decoder fed feature-noise'd features
    (unet.py:349-371). Note: the reference forward reuses aux_decoder1 for
    aux_seg2 (unet.py:370), which contradicts its own constructor; we
    implement the evident intent (aux_decoder2).

TPU-first design: channels-last layout, compute dtype configurable
(default bfloat16 for the MXU; BatchNorm statistics in float32), logits
always returned in float32. Weight init matches torch's Conv2d default
(kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for weight and bias) so
training dynamics are comparable.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import FusedBatchNorm

Dtype = Any


def batch_norm(x, *, train: bool, name: str | None = None):
    """BatchNorm with f32 statistics. WSL4MIS_BN_IMPL selects the flax
    reference implementation ("flax", promotes activations to f32) or the
    bandwidth-saving FusedBatchNorm ("fused", default: f32 stats, bf16
    apply; same param/stat tree so checkpoints are interchangeable)."""
    if os.environ.get("WSL4MIS_BN_IMPL", "fused") == "fused":
        return FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )(x)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, name=name,
    )(x)

DEFAULT_FEATURES = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


def _uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


@functools.lru_cache(maxsize=None)
def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


class _ConvOp(nn.Module):
    """nn.Conv-compatible conv (same param tree: kernel/bias) that can
    route 3x3 small-channel convs through banded-matmul lowerings — the
    reference widths (16/32 channels at full resolution) pad to ~7% MXU
    tile occupancy under the direct lowering (RESULTS.md roofline).

    WSL4MIS_CONV_IMPL selects:
      * "pallas" — in-VMEM banded Pallas kernel with custom VJP
        (ops/pallas/banded_conv_pallas.py); the production TPU path.
      * "banded" — graph-level jnp specification (ops/banded_conv.py);
        bit-tested vs lax.conv but slower on-chip (HBM regroup
        materialization, round-2 negative result) — kept as the testable
        spec of the banded semantics.
      * "direct" — lax.conv_general_dilated.
      * unset — "pallas" on TPU (measured 1.4x step win, RESULTS.md
        round 3), "direct" elsewhere.
    """

    features: int
    kernel_size: tuple[int, int]
    dtype: Dtype
    kernel_init: Any
    bias_init: Any
    with_stats: bool = False  # return (y, s1, s2) on the pallas path
    grouped_out: bool = False   # flat chain: emit raw grouped (N,H,G,Nhat)
    grouped_in_w: int = 0       # flat chain: input is grouped, width w
    split_flat_w: int = 0       # x = (a, b) grouped halves; conv as two
    #                             kernel-split gio calls summed (UpBlock
    #                             flat path: conv(concat(a,b)) with no
    #                             materialized concat)

    @nn.compact
    def __call__(self, x):
        if self.split_flat_w:
            return self._split_flat(x)
        in_ch = (
            x.shape[-1] if not self.grouped_in_w
            else (x.shape[-2] * x.shape[-1]) // self.grouped_in_w
        )
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = self.param(
            "bias", self.bias_init, (self.features,), jnp.float32
        )
        xx = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        impl = os.environ.get("WSL4MIS_CONV_IMPL")
        if impl is None:
            impl = "pallas" if _on_tpu() else "direct"
        if self.grouped_out or self.grouped_in_w:
            # flat-chained block path (caller checked chain eligibility)
            from ..ops.pallas.banded_conv_pallas import (
                banded_conv3x3_pallas_stats_grouped_in,
                banded_conv3x3_pallas_stats_grouped_io,
                banded_conv3x3_pallas_stats_grouped_out,
            )

            b = bias.astype(self.dtype)
            if self.grouped_in_w and self.grouped_out:
                return banded_conv3x3_pallas_stats_grouped_io(
                    xx, self.grouped_in_w, k, b, interpret=not _on_tpu()
                )
            if self.grouped_in_w:
                return banded_conv3x3_pallas_stats_grouped_in(
                    xx, self.grouped_in_w, k, b, interpret=not _on_tpu()
                )
            return banded_conv3x3_pallas_stats_grouped_out(
                xx, k, b, interpret=not _on_tpu()
            )
        if impl == "pallas":
            from ..ops.pallas.banded_conv_pallas import (
                banded_conv3x3_pallas,
                banded_conv3x3_pallas_stats,
                eligible,
            )

            if eligible(xx.shape, kshape):
                b = bias.astype(self.dtype)
                if self.with_stats:
                    # conv + BN moments in one kernel pass (epilogue);
                    # caller feeds them to FusedBatchNorm(moments=...)
                    return banded_conv3x3_pallas_stats(
                        xx, k, b, interpret=not _on_tpu()
                    )
                return banded_conv3x3_pallas(
                    xx, k, b, interpret=not _on_tpu()
                )
        elif impl == "banded":
            from ..ops.banded_conv import banded_conv3x3, small_channel_eligible

            if small_channel_eligible(kshape):
                return banded_conv3x3(xx, k, bias)
        y = jax.lax.conv_general_dilated(
            xx, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    def _split_flat(self, x):
        """conv(concat(a, b)) as two kernel-split grouped-io convs summed
        — the UpBlock flat path's replacement for the channel concat,
        whose per-pixel lane interleave is a materializing copy. a and b
        arrive as grouped dense halves with EQUAL channel counts (equal
        plans, so the grouped outputs are byte-compatible and sum
        elementwise). Returns (yg, s1, s2) with f32 channel moments
        reduced off the dense lanes (fuses into the summing op).
        Numerics: each half accumulates f32 in its own kernel and rounds
        to the compute dtype before the add — within one bf16 ulp of the
        single-kernel concat path (exact in f32 up to sum order)."""
        from ..ops.pallas.banded_conv_pallas import (
            banded_conv3x3_pallas_stats_grouped_io,
            plan_banded,
        )

        a, b = x
        w = self.split_flat_w
        n, h = a.shape[0], a.shape[1]
        ca = (a.shape[-2] * a.shape[-1]) // w
        cb = (b.shape[-2] * b.shape[-1]) // w
        assert ca == cb, (ca, cb)
        in_ch = ca + cb
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = self.param(
            "bias", self.bias_init, (self.features,), jnp.float32
        )
        k = kernel.astype(self.dtype)
        interp = not _on_tpu()
        ya, _, _ = banded_conv3x3_pallas_stats_grouped_io(
            a.astype(self.dtype), w, k[:, :, :ca], bias.astype(self.dtype),
            interpret=interp,
        )
        yb, _, _ = banded_conv3x3_pallas_stats_grouped_io(
            b.astype(self.dtype), w, k[:, :, ca:], None, interpret=interp,
        )
        yg = ya + yb
        jj = plan_banded(ca, self.features, h, w).j
        y5 = yg.astype(jnp.float32).reshape(
            n, h, -1, jj, self.features
        )
        s1 = jnp.sum(y5, axis=(0, 1, 2, 3))
        s2 = jnp.sum(jnp.square(y5), axis=(0, 1, 2, 3))
        return yg, s1, s2


class TorchConv(nn.Module):
    """3x3/1x1 conv with torch-default initialization (NHWC)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.bfloat16
    with_stats: bool = False
    grouped_out: bool = False
    grouped_in_w: int = 0
    split_flat_w: int = 0

    @nn.compact
    def __call__(self, x):
        if self.split_flat_w:
            a, b = x
            in_ch = (
                (a.shape[-2] * a.shape[-1]) + (b.shape[-2] * b.shape[-1])
            ) // self.split_flat_w
        elif self.grouped_in_w:
            in_ch = (x.shape[-2] * x.shape[-1]) // self.grouped_in_w
        else:
            in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        bound = 1.0 / (fan_in ** 0.5)
        return _ConvOp(
            self.features,
            self.kernel_size,
            self.dtype,
            _uniform_bound(bound),
            _uniform_bound(bound),
            with_stats=self.with_stats,
            grouped_out=self.grouped_out,
            grouped_in_w=self.grouped_in_w,
            split_flat_w=self.split_flat_w,
            name="Conv_0",
        )(x)


class _MatmulConvTranspose(nn.Module):
    """2x2 stride-2 transposed conv as ONE matmul + pixel interleave.

    With kernel==stride, every output pixel receives exactly one tap:
    out[n, 2i+a, 2j+b, o] = sum_c x[n,i,j,c] * K[a,b,c,o]. The direct
    lowering dispatches a lhs-dilated conv whose contraction (C) pads to
    128 MXU lanes per tap; packing the 4 taps into the matmul N-dim
    (C -> 4*O) quarters the padded FLOPs. Same param tree (kernel/bias,
    flax ConvTranspose shapes) so checkpoints are interchangeable;
    bit-parity tested in tests/test_models.py.

    out_flat: emit the dense flat (N, 2H, 2W*O) view instead of 4D — the
    same bytes in the same order (the trailing reshape is flipped), for
    consumers that stay in the flat domain (UpBlock flat path).
    """

    features: int
    dtype: Dtype
    kernel_init: Any
    bias_init: Any
    out_flat: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        o = self.features
        kernel = self.param(
            "kernel", self.kernel_init, (2, 2, c, o), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (o,), jnp.float32)
        # lax.conv_transpose applies the kernel spatially mirrored (the
        # gradient-of-conv convention): output subpixel (a, b) takes tap
        # K[1-a, 1-b] — bit-verified vs flax in tests/test_tconv_matmul.py.
        km = (
            kernel[::-1, ::-1]
            .astype(self.dtype)
            .transpose(2, 0, 1, 3)
            .reshape(c, 4 * o)
        )
        y = jax.lax.dot_general(
            x.astype(self.dtype), km, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, H, W, 4*O), columns ordered (a, b, o)
        # bias + cast BEFORE the interleave so the one real relayout (the
        # row interleave) moves bf16, not f32 (the f32 transpose copies
        # were ~1.7 ms/step in the round-3 trace). The width interleave
        # (w, b, o) -> (2w, o) is lane-order-preserving and free.
        y = (y + jnp.tile(bias, 4)).astype(self.dtype)
        if self.out_flat:
            ya = y[..., : 2 * o].reshape(n, h, 2 * w * o)
            yb = y[..., 2 * o:].reshape(n, h, 2 * w * o)
            return jnp.stack([ya, yb], axis=2).reshape(n, 2 * h, 2 * w * o)
        ya = y[..., : 2 * o].reshape(n, h, 2 * w, o)
        yb = y[..., 2 * o:].reshape(n, h, 2 * w, o)
        return jnp.stack([ya, yb], axis=2).reshape(n, 2 * h, 2 * w, o)


class TorchConvTranspose(nn.Module):
    """2x2 stride-2 transposed conv with torch-default init (NHWC).

    torch computes fan_in for ConvTranspose2d from weight dim 1
    (= out_channels * k * k); replicated here. WSL4MIS_TCONV_IMPL selects
    "matmul" (single-matmul lowering, same param tree — the TPU default)
    or "direct" (flax ConvTranspose — the default off-TPU).
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    out_flat: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = self.features * 2 * 2
        bound = 1.0 / (fan_in ** 0.5)
        impl = os.environ.get("WSL4MIS_TCONV_IMPL")
        if impl is None:
            impl = "matmul" if _on_tpu() else "direct"
        if impl == "matmul":
            return _MatmulConvTranspose(
                self.features,
                self.dtype,
                _uniform_bound(bound),
                _uniform_bound(bound),
                out_flat=self.out_flat,
                name="ConvTranspose_0",
            )(x)
        assert not self.out_flat  # caller gates on impl == "matmul"
        return nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            dtype=self.dtype,
            kernel_init=_uniform_bound(bound),
            bias_init=_uniform_bound(bound),
        )(x)


def _max_pool_2x2(x):
    """2x2/stride-2 max pool. WSL4MIS_POOL_IMPL selects "fused" (strided
    slices + elementwise max, first-max custom VJP — ops/maxpool.py) or
    "direct" (nn.max_pool's reduce-window/select-and-scatter — the
    default everywhere). The fused path was built to kill the relayout
    copies the trace attributed to pooling's batch-minor layouts, but
    the on-chip A/B was NEGATIVE at batch 24 (fully_supervised step
    34.7 -> 41.2 ms, pce 33.7 -> 40.3 ms; batch-6 dmpls neutral at
    ~14.8 ms) — the backward's compare+interleave costs more than
    select-and-scatter saves (RESULTS.md round 3). "fused2" keeps the
    fused forward but reformulates the backward as one broadcast-indexed
    loop fusion (no stack/reshape interleave — ops/maxpool.py v2 notes).
    All paths bit-parity-tested in tests/test_maxpool.py.

    "fused3" (round 5, the TPU default): selection-matmul pool — pixel
    pairs are compacted by MXU dots with static 0/1 matrices instead of
    lane-granular strided slices, so every op is block-granular and no
    reduce-window/select-and-scatter remains to batch-minor-poison the
    neighbouring fusions (the round-5 HLO/trace join billed those copies
    above the pool ops themselves). Measured fs24 28.1 -> 24.9 ms."""
    impl = os.environ.get("WSL4MIS_POOL_IMPL")
    if impl is None:
        impl = "fused3" if _on_tpu() else "direct"
    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if impl == "pallas" and even:
        # Pallas kernels pin the default layout on BOTH sides of the
        # pool, so the pool<->banded-conv relayout seam cannot exist
        # (ops/pallas/maxpool_pallas.py). Interpret mode off-TPU.
        from ..ops.pallas.maxpool_pallas import max_pool_2x2_pallas

        return max_pool_2x2_pallas(x, interpret=not _on_tpu())
    if impl == "fused3":
        from ..ops.maxpool import _v3_applicable, max_pool_2x2_v3

        if _v3_applicable(x.shape):
            # selection-matmul pool: block-granular ops only, no
            # reduce-window/select-and-scatter layout poisoning
            return max_pool_2x2_v3(x)
    if impl in ("fused", "fused2") and even:
        from ..ops.maxpool import max_pool_2x2, max_pool_2x2_v2

        return max_pool_2x2_v2(x) if impl == "fused2" else max_pool_2x2(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def chain_ok(shape, features: int, train: bool) -> bool:
    """Flat-chain eligibility for a ConvBlock with logical input `shape`
    (N, H, W, C) — see ConvBlock._chain_ok for the knob semantics."""
    if not train or len(shape) != 4:
        return False
    if os.environ.get("WSL4MIS_CONV_CHAIN", "flat") != "flat":
        return False
    if os.environ.get("WSL4MIS_BN_IMPL", "fused") != "fused":
        return False
    impl = os.environ.get("WSL4MIS_CONV_IMPL")
    if impl is None:
        impl = "pallas" if _on_tpu() else "direct"
    if impl != "pallas":
        return False
    from ..ops.pallas.banded_conv_pallas import (
        dense_chainable,
        eligible,
        plan_banded,
    )

    n, h, w, c = shape
    k1 = (3, 3, c, features)
    if not eligible(shape, k1):
        return False
    if not dense_chainable(plan_banded(c, features, h, w)):
        return False
    return eligible((n, h, w, features), (3, 3, features, features))


def block_emits_flat(shape, features: int, train: bool) -> bool:
    """True when a ConvBlock on logical `shape` can emit its output in
    the dense flat (N, H, W*F) domain: the chain holds AND conv2's own
    grouped output is byte-identical to row-major (dense_chainable)."""
    if not chain_ok(shape, features, train):
        return False
    from ..ops.pallas.banded_conv_pallas import dense_chainable, plan_banded

    n, h, w, _c = shape
    return dense_chainable(plan_banded(features, features, h, w))


class ConvBlock(nn.Module):
    features: int
    dropout_p: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool, in_flat_w: int | None = None,
                 out_flat: bool = False,
                 split_in: tuple | None = None):
        """in_flat_w: x arrives as the dense flat (N, H, W*C) tensor with
        logical width in_flat_w (caller verified chain_ok); out_flat:
        return the dense flat (N, H, W*F) output (caller verified
        block_emits_flat). Both are train-time flat-chain extensions —
        the byte order is identical to the 4D path, so parity (incl. the
        dropout stream) is preserved (tests/test_conv_chain.py).

        split_in: (a_flat, b_flat, w) — the block's logical input is
        concat(a, b) on channels but never materialized; conv1 runs as
        two kernel-split grouped convs summed (UpBlock flat path)."""
        if split_in is not None:
            return self._chain_flat_split(*split_in, out_flat=out_flat)
        if in_flat_w is not None:
            return self._chain_flat(x, in_flat_w=in_flat_w,
                                    out_flat=out_flat)
        if self._chain_ok(x, train):
            return self._chain_flat(x, out_flat=out_flat)
        # WSL4MIS_BN_STATS=epilogue: the banded conv kernel emits BN
        # moments from its epilogue (banded_conv3x3_pallas_stats) so
        # FusedBatchNorm skips its full-tensor stats reduction.
        want_stats = (
            train and os.environ.get("WSL4MIS_BN_STATS") == "epilogue"
        )
        x = self._conv_bn(x, "BatchNorm_0", want_stats, train)
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        if self.dropout_p > 0 and train:
            # Inline dropout in compute dtype: nn.Dropout's where(mask,
            # x/keep, 0) materialized extra full-resolution passes, which
            # on TPU cost more than the convs it sits between. A bf16
            # mask-multiply (mask is exact in bf16) fuses into neighbors.
            keep = 1.0 - self.dropout_p
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, x.shape
            )
            x = x * (mask.astype(self.dtype) * jnp.asarray(1.0 / keep, self.dtype))
        x = self._conv_bn(x, "BatchNorm_1", want_stats, train)
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        return x

    def _chain_ok(self, x, train: bool) -> bool:
        """Flat-chain eligibility (WSL4MIS_CONV_CHAIN=flat): train-time
        pallas route where conv1's grouped output is byte-identical to its
        4D output (dense_chainable) and conv2 is banded-eligible. Then
        BN apply / LeakyReLU / dropout run on the dense grouped lanes and
        NO unpack/re-pad/XLA-relayout seam exists inside the block —
        the round-4 HLO/trace join billed those seams (H-/W-minor fusion
        layouts + pad copies) above the pool itself. Bit-parity with the
        4D path incl. the dropout stream (same row-major element order)
        is tested in tests/test_conv_chain.py."""
        # Knob precedence notes (see chain_ok): a flat chain structurally
        # uses FusedBatchNorm with conv-epilogue moments, so it is only
        # taken when WSL4MIS_BN_IMPL is at its fused default;
        # WSL4MIS_BN_STATS only affects the unchained path. default ON:
        # measured fs24 32.8 -> 32.2 ms (model/r4_bench_chain.json).
        return chain_ok(tuple(x.shape) if x.ndim == 4 else (),
                        self.features, train)

    def _chain_flat(self, x, in_flat_w: int | None = None,
                    out_flat: bool = False):
        from ..ops.pallas.banded_conv_pallas import plan_banded

        n, h = x.shape[0], x.shape[1]
        if in_flat_w is not None:
            w = in_flat_w
            lanes = x.shape[2]
            c = lanes // w
            x = x.reshape(n, h, lanes // 128, 128)
        else:
            w, c = x.shape[2], x.shape[3]
        plan1 = plan_banded(c, self.features, h, w)
        yg, s1, s2 = TorchConv(
            self.features, dtype=self.dtype, grouped_out=True,
            grouped_in_w=(w if in_flat_w is not None else 0),
        )(x)
        return self._chain_tail(yg, s1, s2, plan1.j, n, h, w, out_flat)

    def _chain_flat_split(self, a_flat, b_flat, w: int,
                          out_flat: bool = False):
        """conv1 over a never-materialized channel concat: two grouped
        halves summed (see _ConvOp._split_flat), then the standard flat
        chain tail. The decoder ConvBlocks have dropout_p == 0 so the
        rng stream is untouched."""
        from ..ops.pallas.banded_conv_pallas import plan_banded

        n, h = a_flat.shape[0], a_flat.shape[1]
        a4 = a_flat.reshape(n, h, a_flat.shape[2] // 128, 128)
        b4 = b_flat.reshape(n, h, b_flat.shape[2] // 128, 128)
        ca = a_flat.shape[2] // w
        plan1 = plan_banded(ca, self.features, h, w)
        yg, s1, s2 = TorchConv(
            self.features, dtype=self.dtype, split_flat_w=w
        )((a4, b4))
        return self._chain_tail(yg, s1, s2, plan1.j, n, h, w, out_flat)

    def _chain_tail(self, yg, s1, s2, lane_tile, n, h, w,
                    out_flat: bool):
        """Shared tail of the flat-chain variants: BN0 on the grouped
        conv1 output (epilogue moments), LeakyReLU, dropout, then conv2
        emitting either the dense flat (out_flat) or the 4D output.
        Submodule call ORDER here fixes the flax auto-names, so it must
        match the 4D path's (conv1 -> conv2); BN names are explicit."""
        from ..ops.pallas.banded_conv_pallas import plan_banded

        y = FusedBatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5,
            name="BatchNorm_0",
        )(yg, moments=(s1, s2), lane_tile=lane_tile)
        y = nn.leaky_relu(y, negative_slope=0.01).astype(self.dtype)
        if self.dropout_p > 0:
            keep = 1.0 - self.dropout_p
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, y.shape
            )
            y = y * (mask.astype(self.dtype)
                     * jnp.asarray(1.0 / keep, self.dtype))
        if out_flat:
            plan2 = plan_banded(self.features, self.features, h, w)
            yg2, s1b, s2b = TorchConv(
                self.features, dtype=self.dtype, grouped_in_w=w,
                grouped_out=True,
            )(y)
            y2 = FusedBatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5,
                name="BatchNorm_1",
            )(yg2, moments=(s1b, s2b), lane_tile=plan2.j)
            y2 = nn.leaky_relu(y2, negative_slope=0.01).astype(self.dtype)
            return y2.reshape(n, h, w * self.features)
        y4, s1b, s2b = TorchConv(
            self.features, dtype=self.dtype, grouped_in_w=w
        )(y)
        y4 = FusedBatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5,
            name="BatchNorm_1",
        )(y4, moments=(s1b, s2b))
        return nn.leaky_relu(y4, negative_slope=0.01).astype(self.dtype)

    def _conv_bn(self, x, bn_name, want_stats, train):
        out = TorchConv(
            self.features, dtype=self.dtype, with_stats=want_stats
        )(x)
        if isinstance(out, tuple):  # pallas path honored the request
            y, s1, s2 = out
            return FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=bn_name,
            )(y, moments=(s1, s2))
        return batch_norm(out, train=train, name=bn_name)


def _flat_seam_ok(in_shape, f_cur: int, f_next: int, train: bool) -> bool:
    """True when the ConvBlock(in_shape -> f_cur) -> maxpool ->
    ConvBlock(f_cur -> f_next) seam can run entirely in the dense flat
    (N, H, W*C) domain: the producer can emit flat, the selection-matmul
    pool applies at the producer's output shape, and the consumer can
    take flat input at the pooled shape. WSL4MIS_POOL_CHAIN selects it
    (TPU pool impl must resolve to fused3, the matching pool math);
    default ON since the round-5 on-chip A/B: fs24 24.9 -> 23.1 ms,
    pce 22.9, dmpls 9.3 (model/r5_hook_*_flat.json vs r4 fused3)."""
    if os.environ.get("WSL4MIS_POOL_CHAIN", "flat") != "flat":
        return False
    impl = os.environ.get("WSL4MIS_POOL_IMPL")
    if impl is None:
        impl = "fused3" if _on_tpu() else "direct"
    if impl != "fused3":
        return False
    from ..ops.maxpool import _v3_applicable

    if not block_emits_flat(in_shape, f_cur, train):
        return False
    n, h, w, _c = in_shape
    if not _v3_applicable((n, h, w, f_cur)):
        return False
    return chain_ok((n, h // 2, w // 2, f_cur), f_next, train)


class Encoder(nn.Module):
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        from ..ops.maxpool import max_pool_2x2_flat

        f, d = self.features, self.dropout
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        # flat pool seams (round 5): when a stage's ConvBlock -> pool ->
        # ConvBlock can all run on dense flat rows, no 4D small-C tensor
        # exists at the seam and XLA cannot interpose its tiled W-/H-minor
        # layouts (each such seam billed 0.2-0.6 ms of pad/reshape/copy in
        # the round-5 trace/HLO join). The skip feature stays available as
        # a free row-major reshape of the same bytes.
        seam = []
        sh = (n, h, w, x.shape[3])
        for i in range(len(f) - 1):
            seam.append(_flat_seam_ok(sh, f[i], f[i + 1], train))
            sh = (n, sh[1] // 2, sh[2] // 2, f[i])

        feats = []
        cur_w = w
        x = ConvBlock(f[0], d[0], self.dtype)(x, train=train,
                                              out_flat=seam[0])
        feats.append(
            x.reshape(n, x.shape[1], cur_w, f[0]) if seam[0] else x
        )
        for i, (ch, p) in enumerate(zip(f[1:], d[1:]), start=1):
            emit = seam[i] if i < len(f) - 1 else False
            if seam[i - 1]:
                x = max_pool_2x2_flat(x, f[i - 1])
                cur_w //= 2
                x = ConvBlock(ch, p, self.dtype)(
                    x, train=train, in_flat_w=cur_w, out_flat=emit
                )
            else:
                x = _max_pool_2x2(feats[-1])
                cur_w //= 2
                x = ConvBlock(ch, p, self.dtype)(x, train=train,
                                                 out_flat=emit)
            feats.append(
                x.reshape(n, x.shape[1], cur_w, ch) if emit else x
            )
        return feats


def _up_flat_ok(skip_shape, skip_features: int, out_features: int,
                train: bool) -> bool:
    """UpBlock flat-path eligibility (WSL4MIS_UP_CHAIN=flat): the matmul
    tconv emits the dense flat view, conv1 runs as two kernel-split
    grouped convs (no materialized concat), conv2 chains grouped-in.
    Requires the tconv channel count to equal the skip's (true for every
    reference UpBlock) and banded+dense plans for the half-channel conv."""
    if os.environ.get("WSL4MIS_UP_CHAIN", "flat") != "flat":
        return False
    if not train:
        return False
    timpl = os.environ.get("WSL4MIS_TCONV_IMPL")
    if timpl is None:
        timpl = "matmul" if _on_tpu() else "direct"
    if timpl != "matmul":
        return False
    n, h2, w2, cs = skip_shape
    if cs != skip_features:
        return False
    # chain_ok already demands dense_chainable(plan_banded(cs,
    # out_features, h2, w2)) — the split-kernel halves run on the same
    # plan, so no extra eligibility condition exists for the up path.
    return chain_ok((n, h2, w2, cs), out_features, train)


class UpBlock(nn.Module):
    """ConvTranspose upsample of the deep path, concat skip, ConvBlock."""

    skip_features: int
    out_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_deep, x_skip, *, train: bool):
        if _up_flat_ok(tuple(x_skip.shape), self.skip_features,
                       self.out_features, train):
            n, h2, w2, cs = x_skip.shape
            up_f = TorchConvTranspose(
                self.skip_features, dtype=self.dtype, out_flat=True
            )(x_deep)
            skip_f = x_skip.astype(self.dtype).reshape(n, h2, w2 * cs)
            return ConvBlock(self.out_features, 0.0, self.dtype)(
                None, train=train, split_in=(skip_f, up_f, w2)
            )
        x = TorchConvTranspose(self.skip_features, dtype=self.dtype)(x_deep)
        x = jnp.concatenate([x_skip, x], axis=-1)
        return ConvBlock(self.out_features, 0.0, self.dtype)(x, train=train)


class Decoder(nn.Module):
    features: Sequence[int] = DEFAULT_FEATURES
    num_classes: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, *, train: bool):
        f = self.features
        x = UpBlock(f[3], f[3], self.dtype)(feats[4], feats[3], train=train)
        x = UpBlock(f[2], f[2], self.dtype)(x, feats[2], train=train)
        x = UpBlock(f[1], f[1], self.dtype)(x, feats[1], train=train)
        x = UpBlock(f[0], f[0], self.dtype)(x, feats[0], train=train)
        logits = TorchConv(self.num_classes, dtype=self.dtype)(x)
        return logits.astype(jnp.float32)


class DecoderDS(nn.Module):
    """Decoder with deep-supervision heads at every scale (unet.py:138-188)."""

    features: Sequence[int] = DEFAULT_FEATURES
    num_classes: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, *, train: bool):
        f = self.features
        out_hw = feats[0].shape[1:3]

        def head(x):
            return TorchConv(self.num_classes, dtype=self.dtype)(x)

        def up_to_full(z):
            return jax.image.resize(
                z, (z.shape[0], *out_hw, z.shape[-1]), method="nearest"
            ).astype(jnp.float32)

        x = UpBlock(f[3], f[3], self.dtype)(feats[4], feats[3], train=train)
        dp3 = up_to_full(head(x))
        x = UpBlock(f[2], f[2], self.dtype)(x, feats[2], train=train)
        dp2 = up_to_full(head(x))
        x = UpBlock(f[1], f[1], self.dtype)(x, feats[1], train=train)
        dp1 = up_to_full(head(x))
        x = UpBlock(f[0], f[0], self.dtype)(x, feats[0], train=train)
        dp0 = head(x).astype(jnp.float32)
        return dp0, dp1, dp2, dp3


class DecoderURDS(nn.Module):
    """Deep-supervision decoder with per-scale feature perturbations
    (unet.py:191-256, URPC-style).

    Training-only perturbations before the scale heads: channel dropout at
    1/8 scale (the reference's functional ``Dropout`` is ``F.dropout2d``,
    unet.py:255-257), attention feature-dropout at 1/4, multiplicative
    feature noise at 1/2; heads nearest-resized to full resolution. The
    reference never instantiates this decoder (dead code); it is provided
    as a working model variant (``unet_urds``) with the evident semantics.
    """

    features: Sequence[int] = DEFAULT_FEATURES
    num_classes: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, *, train: bool):
        f = self.features
        out_hw = feats[0].shape[1:3]

        def head(x):
            return TorchConv(self.num_classes, dtype=self.dtype)(x)

        def up_to_full(z):
            return jax.image.resize(
                z, (z.shape[0], *out_hw, z.shape[-1]), method="nearest"
            ).astype(jnp.float32)

        if train:
            k3, k2, k1 = jax.random.split(self.make_rng("feature_perturb"), 3)
        x = UpBlock(f[3], f[3], self.dtype)(feats[4], feats[3], train=train)
        dp3 = up_to_full(head(channel_dropout(k3, x) if train else x))
        x = UpBlock(f[2], f[2], self.dtype)(x, feats[2], train=train)
        dp2 = up_to_full(head(feature_dropout(k2, x) if train else x))
        x = UpBlock(f[1], f[1], self.dtype)(x, feats[1], train=train)
        dp1 = up_to_full(head(feature_noise(k1, x) if train else x))
        x = UpBlock(f[0], f[0], self.dtype)(x, feats[0], train=train)
        dp0 = head(x).astype(jnp.float32)
        return dp0, dp1, dp2, dp3


def channel_dropout(rng, x, rate: float = 0.5):
    """torch F.dropout2d: zero whole channels with prob `rate`, scale rest."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def feature_noise(rng, x, uniform_range: float = 0.3):
    """unet.py:270-283: x * U(-r, r) + x with noise shared across batch."""
    noise = jax.random.uniform(
        rng, x.shape[1:], minval=-uniform_range, maxval=uniform_range
    ).astype(x.dtype)
    return x * noise[None] + x


def feature_dropout(rng, x):
    """unet.py:259-267: drop spatial positions above a random attention cut."""
    attention = jnp.mean(x, axis=-1, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
    thresh = max_val * jax.random.uniform(rng, (), minval=0.7, maxval=0.9)
    mask = (attention < thresh[:, None, None, None]).astype(x.dtype)
    return x * mask


class UNet(nn.Module):
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.features, self.dropout, self.dtype)(x, train=train)
        return Decoder(self.features, self.num_classes, self.dtype)(
            feats, train=train
        )


class UNetDS(nn.Module):
    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.features, self.dropout, self.dtype)(x, train=train)
        return DecoderDS(self.features, self.num_classes, self.dtype)(
            feats, train=train
        )


class UNetURDS(nn.Module):
    """Encoder + DecoderURDS (no reference consumer; see DecoderURDS)."""

    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.features, self.dropout, self.dtype)(x, train=train)
        return DecoderURDS(self.features, self.num_classes, self.dtype)(
            feats, train=train
        )


class UNetCCT(nn.Module):
    """Dual-branch net for DMPLS: main decoder + channel-dropout aux decoder."""

    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.features, self.dropout, self.dtype)(x, train=train)
        main = Decoder(self.features, self.num_classes, self.dtype, name="main_decoder")(
            feats, train=train
        )
        if train:
            rng = self.make_rng("feature_perturb")
            keys = jax.random.split(rng, len(feats))
            feats_aux = [channel_dropout(k, f) for k, f in zip(keys, feats)]
        else:
            feats_aux = feats
        aux = Decoder(self.features, self.num_classes, self.dtype, name="aux_decoder1")(
            feats_aux, train=train
        )
        return main, aux


class UNetCCT3H(nn.Module):
    """Three-headed CCT variant (unet.py:349-371, intent-corrected)."""

    num_classes: int = 4
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = Encoder(self.features, self.dropout, self.dtype)(x, train=train)
        main = Decoder(self.features, self.num_classes, self.dtype, name="main_decoder")(
            feats, train=train
        )
        if train:
            rng = self.make_rng("feature_perturb")
            k1, k2 = jax.random.split(rng)
            keys1 = jax.random.split(k1, len(feats))
            keys2 = jax.random.split(k2, len(feats))
            feats_a1 = [channel_dropout(k, f) for k, f in zip(keys1, feats)]
            feats_a2 = [feature_noise(k, f) for k, f in zip(keys2, feats)]
        else:
            feats_a1 = feats_a2 = feats
        aux1 = Decoder(self.features, self.num_classes, self.dtype, name="aux_decoder1")(
            feats_a1, train=train
        )
        aux2 = Decoder(self.features, self.num_classes, self.dtype, name="aux_decoder2")(
            feats_a2, train=train
        )
        return main, aux1, aux2
