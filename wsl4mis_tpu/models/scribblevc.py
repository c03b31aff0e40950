"""ScribbleVC — CNN+Transformer (Conformer) hybrid with class-representation
memory.

Rebuilds /root/reference/code/networks/scribbleVC_ACDC.py (ACDC config from
scribbleVC.py:13-17: patch 16, channel_ratio 4, embed 384, depth 12, heads
6, qkv_bias, drop_path 0.1, grayscale input):

  * 12-stage Conformer trunk: a ResNet-style bottleneck CNN stream and a
    ViT token stream coupled every stage by FCUDown/FCUUp bridges
    (scribbleVC_ACDC.py:150-198, 256-309); stages 5 and 9 halve the
    spatial grid and double channels (256 -> 512 -> 1024);
  * encoder taps after the stem convs and stages 4/8/12 feed a U-Net
    decoder with bilinear(align_corners=True) upsampling
    (Decoder, :377-424); the final token grid feeds a skip-free
    upsampling decoder (Decoder_trans, :425-482);
  * dual multi-label classification heads (conv_cls_head 3x3+GAP and
    LayerNorm+Linear on the cls token, :503-508);
  * class-representation memory (:670-759): EMA class prototypes of the
    deepest CNN/token features, validated by re-classifying the
    prototype, injected into the features both at train (ep > 4) and
    val time. The reference keeps these as mutable attributes; here they
    live in a `class_memory` flax variable collection threaded through
    the train step (explicit state pytree, SURVEY §7).

Returns (seg_conv, seg_trans, (conv_cls, tran_cls)) like the reference
(:765). NHWC layout; token shapes (B, 1 + N, D).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nets3d import _interp_axis

Dtype = Any

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)
_kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def upsample2d(x, factor: int, method: str = "bilinear_ac"):
    """NHWC 2D upsampling: 'bilinear_ac' (align_corners=True) | 'nearest'."""
    if method == "nearest":
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")
    for axis in (1, 2):
        x = _interp_axis(x, axis, x.shape[axis] * factor, align_corners=True)
    return x


def drop_path(rng, x, rate: float):
    """Stochastic depth: drop the residual branch per sample."""
    if rate == 0.0:
        return x
    keep = jax.random.bernoulli(
        rng, 1.0 - rate, (x.shape[0],) + (1,) * (x.ndim - 1)
    )
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class BN(nn.Module):
    """BatchNorm2d(eps=1e-6) as the Conformer uses (scribbleVC_ACDC.py:88)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, *, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=self.eps,
            dtype=jnp.float32,
        )(x)


class Conv(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_kaiming_out, bias_init=nn.initializers.zeros,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_trunc02, bias_init=nn.initializers.zeros,
        )(x)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return Dense(self.out, dtype=self.dtype)(x)


class TokenAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        head = c // h
        qkv = Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, h, head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (head ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return Dense(c, dtype=self.dtype)(out)


class TransBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        def ln(z):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(z).astype(
                self.dtype
            )

        y = TokenAttention(self.dim, self.num_heads, dtype=self.dtype)(ln(x))
        if train and self.drop_path_rate > 0:
            y = drop_path(self.make_rng("dropout"), y, self.drop_path_rate)
        x = x + y
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype)(ln(x))
        if train and self.drop_path_rate > 0:
            y = drop_path(self.make_rng("dropout"), y, self.drop_path_rate)
        return x + y


class BottleneckConvBlock(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with optional fusion input
    (scribbleVC_ACDC.py:82-147)."""

    outplanes: int
    stride: int = 1
    res_conv: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t=None, *, train: bool, return_x2: bool = True):
        med = self.outplanes // 4
        residual = x
        h = Conv(med, (1, 1), dtype=self.dtype)(x)
        h = nn.relu(BN()(h, train=train)).astype(self.dtype)
        if x_t is not None:
            h = h + x_t
        h = Conv(med, (3, 3), (self.stride, self.stride), dtype=self.dtype)(h)
        x2 = nn.relu(BN()(h, train=train)).astype(self.dtype)
        h = Conv(self.outplanes, (1, 1), dtype=self.dtype)(x2)
        h = BN()(h, train=train).astype(self.dtype)
        if self.res_conv:
            residual = Conv(
                self.outplanes, (1, 1), (self.stride, self.stride),
                dtype=self.dtype,
            )(x)
            residual = BN()(residual, train=train).astype(self.dtype)
        out = nn.relu(h + residual).astype(self.dtype)
        if return_x2:
            return out, x2
        return out


class FCUDown(nn.Module):
    """CNN map -> tokens: 1x1 project, avgpool dw_stride, LN, GELU, prepend
    cls token (scribbleVC_ACDC.py:150-175)."""

    embed_dim: int
    dw_stride: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t):
        s = self.dw_stride
        h = Conv(self.embed_dim, (1, 1), dtype=self.dtype)(x)
        h = nn.avg_pool(h, (s, s), strides=(s, s))
        h = h.reshape(h.shape[0], -1, self.embed_dim)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(h).astype(self.dtype)
        h = nn.gelu(h)
        return jnp.concatenate([x_t[:, :1], h], axis=1)


class FCUUp(nn.Module):
    """Tokens -> CNN map: 1x1 project + BN + ReLU + nearest x up_stride
    (scribbleVC_ACDC.py:177-198)."""

    outplanes: int
    up_stride: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t, hw, *, train: bool):
        h, w = hw
        b, _, c = x_t.shape
        grid = x_t[:, 1:].reshape(b, h, w, c)
        grid = Conv(self.outplanes, (1, 1), dtype=self.dtype)(grid)
        grid = nn.relu(BN()(grid, train=train)).astype(self.dtype)
        return upsample2d(grid, self.up_stride, "nearest")


class ConvTransBlock(nn.Module):
    """One Conformer stage (scribbleVC_ACDC.py:256-309)."""

    outplanes: int
    res_conv: bool
    stride: int
    dw_stride: int
    embed_dim: int
    num_heads: int
    drop_path_rate: float
    last_fusion: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t, train: bool = False):
        # train is positional-friendly so nn.remat can mark it static
        # (static_argnums counts self — see ScribbleVC.__call__).
        x, x2 = BottleneckConvBlock(
            self.outplanes, self.stride, self.res_conv, self.dtype,
            name="cnn_block",
        )(x, train=train)
        hw = (x2.shape[1] // self.dw_stride, x2.shape[2] // self.dw_stride)
        x_st = FCUDown(self.embed_dim, self.dw_stride, self.dtype)(x2, x_t)
        x_t = TransBlock(
            self.embed_dim, self.num_heads,
            drop_path_rate=self.drop_path_rate, dtype=self.dtype,
        )(x_st + x_t, train=train)
        x_t_r = FCUUp(self.outplanes // 4, self.dw_stride, self.dtype)(
            x_t, hw, train=train
        )
        x = BottleneckConvBlock(
            self.outplanes, 1, self.last_fusion, self.dtype,
            name="fusion_block",
        )(x, x_t_r, train=train, return_x2=False)
        return x, x_t


class UNetUpBilinear(nn.Module):
    """1x1 conv + bilinear(align_corners=True) x2 + concat + ConvBlock
    (UpBlock_UNet, scribbleVC_ACDC.py:329-350; bilinear default True)."""

    skip_features: int
    out_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, deep, skip, *, train: bool):
        h = nn.Conv(
            self.skip_features, (1, 1), dtype=self.dtype,
            kernel_init=_kaiming_out,
        )(deep)
        h = upsample2d(h, 2, "bilinear_ac")
        h = jnp.concatenate([skip, h], axis=-1)
        for _ in range(2):
            h = nn.Conv(
                self.out_features, (3, 3), padding="SAME", dtype=self.dtype,
                kernel_init=_kaiming_out,
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(h)
            h = nn.leaky_relu(h, 0.01).astype(self.dtype)
        return h


def class_memory_update(hf, tf, conv_cls, tran_cls, hist_conv, hist_tran,
                        initialized, hist_weight, conv_head_fn,
                        trans_head_fn):
    """Training-branch class-representation memory math
    (scribbleVC_ACDC.py:670-739), factored out as a pure function so it
    can be oracle-tested against a line-by-line torch reimplementation
    (tests/test_scribblevc_memory_oracle.py).

    Args (all float32):
      hf: (B, H, W, C) trunk features; tf: (B, T, E) layer-normed tokens;
      conv_cls / tran_cls: (B, ncls) classification logits;
      hist_conv: (ncls, H, W, C) and hist_tran: (ncls, T, E) prototypes;
      initialized: () flag (0 on the very first update);
      hist_weight: EMA keep-rate (reference default 0.5);
      conv_head_fn: applies the conv classification head to (ncls,H,W,C)
        prototype maps -> (ncls, ncls) logits; trans_head_fn: applies the
        trans head to (ncls, E) cls-token prototypes -> (ncls, ncls).

    Returns (dh, t_rep, new_hist_conv, new_hist_tran):
      dh: (B, H, W, C) feature injection to add to the trunk;
      t_rep: (B, T, E) token injection (caller drops the cls token);
      new_hist_*: updated prototypes (stop-gradiented, as the reference's
        buffer updates are outside autograd).
    """
    b = hf.shape[0]
    ncls = conv_cls.shape[1]
    hw0 = hist_weight
    rep = jnp.einsum("bi,bhwc->ihwc", conv_cls, hf) / b
    ema = jnp.where(
        initialized > 0, hw0 * hist_conv + (1 - hw0) * rep, rep
    )
    # The head outputs below feed ONLY argmax comparisons, whose tangents
    # are identically zero — stop_gradient is exact here and prunes the
    # prototype-map head adjoints from the backward program (the unpruned
    # form SIGSEGVed the TPU AOT compiler at HEAD, see RESULTS round 3).
    rep_prob = conv_head_fn(jax.lax.stop_gradient(ema))
    is_max = (
        jnp.argmax(rep_prob, axis=1) == jnp.arange(ncls)
    ).astype(jnp.float32)
    rep_masked = is_max[:, None, None, None] * rep
    w_vec = jnp.where(is_max == 0, 1.0, hw0)
    # Gradient-flow parity (scribbleVC_ACDC.py:691-694): the reference
    # detaches only the OLD history term — the fresh (1-w)*rep_masked
    # contribution stays in the graph, so the injection below backprops
    # into this step's features and classification logits. (Round-2
    # stop-gradiented the whole buffer: a real mechanics deviation.)
    new_hist = jnp.where(
        initialized > 0,
        w_vec[:, None, None, None] * jax.lax.stop_gradient(hist_conv)
        + (1 - w_vec)[:, None, None, None] * rep_masked,
        rep_masked,
    )
    conv_prob = jax.nn.sigmoid(conv_cls)
    ok = jnp.all(
        jnp.logical_or(conv_prob < 0.5, is_max > 0), axis=1, keepdims=True
    ).astype(jnp.float32)
    weight = jnp.where(conv_prob < 0.5, 0.0, conv_prob) * ok
    dh = jnp.einsum("ab,bhwc->ahwc", weight, new_hist)

    trep = jnp.einsum("bi,bjk->ijk", tran_cls, tf) / b
    tema = jnp.where(
        initialized > 0, hw0 * hist_tran + (1 - hw0) * trep, trep
    )
    # argmax-only consumer — stop_gradient exact (see rep_prob above)
    trep_prob = trans_head_fn(jax.lax.stop_gradient(tema[:, 0]))
    t_is_max = (
        jnp.argmax(trep_prob, axis=1) == jnp.arange(ncls)
    ).astype(jnp.float32)
    trep_masked = t_is_max[:, None, None] * trep
    t_w = jnp.where(t_is_max == 0, 1.0, hw0)
    new_t_hist = jnp.where(
        initialized > 0,
        t_w[:, None, None] * jax.lax.stop_gradient(hist_tran)
        + (1 - t_w)[:, None, None] * trep_masked,
        trep_masked,
    )
    # reference gates the token injection's all-classes check with the
    # *conv* head's probabilities (scribbleVC_ACDC.py:736)
    t_ok = jnp.all(
        jnp.logical_or(conv_prob < 0.5, t_is_max > 0), axis=1, keepdims=True
    ).astype(jnp.float32)
    tran_prob = jax.nn.sigmoid(tran_cls)
    t_weight = jnp.where(tran_prob < 0.5, 0.0, tran_prob) * t_ok
    t_rep = jnp.einsum("ab,bjk->ajk", t_weight, new_t_hist)
    return (
        dh,
        t_rep,
        jax.lax.stop_gradient(new_hist),
        jax.lax.stop_gradient(new_t_hist),
    )


class ScribbleVC(nn.Module):
    """The ACDC ScribbleVC Net (scribbleVC_ACDC.py:484-765)."""

    num_classes: int = 4
    batch_size: int | None = None
    base_channel: int = 64
    channel_ratio: int = 4
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    drop_path_rate: float = 0.1
    hist_weight: float = 0.5
    dtype: Dtype = jnp.bfloat16
    remat: bool = False                  # checkpoint each Conformer stage:
                                         # recompute activations in the
                                         # backward instead of saving them
                                         # (the train step fits ~15.5G HBM
                                         # at batch 12; remat buys batch
                                         # headroom for FLOPs)

    @nn.compact
    def __call__(self, x, *, train: bool = False, use_class_rep: bool = False,
                 rep_gate=None):
        dt = self.dtype
        b = x.shape[0]
        c1 = self.base_channel * self.channel_ratio          # 256
        c2, c3 = c1 * 2, c1 * 4                              # 512, 1024
        dw = self.patch_size // 4                            # 4
        ncls = self.num_classes - 1
        dpr = [
            self.drop_path_rate * i / (self.depth - 1) for i in range(self.depth)
        ]

        cls_token = self.param(
            "cls_token", _trunc02, (1, 1, self.embed_dim), jnp.float32
        ).astype(dt)

        feature_conv = []
        # stem (forward :633-644)
        h = BottleneckConvBlock(c1 // 4, 1, True, dt, name="conv_1")(
            x.astype(dt), train=train, return_x2=False
        )
        feature_conv.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = BottleneckConvBlock(c1 // 2, 1, True, dt, name="conv_2")(
            h, train=train, return_x2=False
        )
        feature_conv.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = BottleneckConvBlock(c1, 1, True, dt, name="conv_3")(
            h, train=train, return_x2=False
        )

        # stage 1: patchify + first transformer block (:646-649)
        t = nn.Conv(
            self.embed_dim, (dw, dw), strides=(dw, dw), padding="VALID",
            dtype=dt, kernel_init=_kaiming_out,
        )(h)
        gh, gw = t.shape[1], t.shape[2]
        t = t.reshape(b, gh * gw, self.embed_dim)
        t = jnp.concatenate([jnp.tile(cls_token, (b, 1, 1)), t], axis=1)
        t = TransBlock(
            self.embed_dim, self.num_heads, drop_path_rate=dpr[0], dtype=dt,
            name="trans_1",
        )(t, train=train)

        # stages 2..12 (:651-656)
        # static_argnums=(3,) marks `train` static through jax.checkpoint
        # (0 is self in flax's linen.remat convention)
        Stage = (
            nn.remat(ConvTransBlock, static_argnums=(3,))
            if self.remat else ConvTransBlock
        )
        third = self.depth // 3
        for i in range(2, self.depth + 1):
            if i <= third:
                planes, res_conv, stride, dws = c1, False, 1, dw
            elif i <= 2 * third:
                first = i == third + 1
                planes, res_conv, stride, dws = c2, first, 2 if first else 1, dw // 2
            else:
                first = i == 2 * third + 1
                planes, res_conv, stride, dws = c3, first, 2 if first else 1, dw // 4
            h, t = Stage(
                planes, res_conv, stride, dws, self.embed_dim,
                self.num_heads, dpr[i - 1], last_fusion=(i == self.depth),
                dtype=dt, name=f"conv_trans_{i}",
            )(h, t, train)
            if i % 4 == 0:
                feature_conv.append(h)

        # token grid + heads (:658-672); head modules instantiated once so
        # the class-memory branch can reuse their weights
        conv_cls_mod = Conv(ncls, (3, 3), dtype=dt, name="conv_cls_conv")
        trans_cls_mod = Dense(ncls, dtype=dt, name="trans_cls_head")

        x_patch = t[:, 1:].reshape(b, gh, gw, self.embed_dim)
        conv_cls = jnp.mean(
            conv_cls_mod(h).astype(jnp.float32), axis=(1, 2)
        )  # (B, ncls)
        t_normed = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, name="trans_norm"
        )(t).astype(dt)
        tran_cls = trans_cls_mod(t_normed[:, 0]).astype(jnp.float32)

        # ---- class-representation memory (:670-759) ----
        hist_conv = self.variable(
            "class_memory", "hist_conv",
            lambda: jnp.zeros((ncls, *h.shape[1:]), jnp.float32),
        )
        hist_tran = self.variable(
            "class_memory", "hist_tran",
            lambda: jnp.zeros((ncls, t.shape[1], self.embed_dim), jnp.float32),
        )
        initialized = self.variable(
            "class_memory", "initialized", lambda: jnp.zeros((), jnp.float32)
        )

        def conv_head_on(z):
            # shared conv_cls head weights applied to the class prototypes
            out = conv_cls_mod(z.astype(dt))
            return jnp.mean(out.astype(jnp.float32), axis=(1, 2))

        # No-op unless applied with mutable=["intermediates"]: the exact
        # (features, tokens, logits) quadruple the class memory consumes,
        # captured pre-injection for the trained-state torch oracle
        # (scripts/oracle_scribblevc_memory.py, VERDICT r3 item 3).
        self.sow(
            "intermediates", "memory_inputs",
            (
                h.astype(jnp.float32), t_normed.astype(jnp.float32),
                conv_cls, tran_cls,
            ),
        )

        if use_class_rep and train and b == self.batch_size:
            dh, t_rep, new_hist, new_t_hist = class_memory_update(
                h.astype(jnp.float32),
                t_normed.astype(jnp.float32),
                conv_cls,
                tran_cls,
                hist_conv.value,
                hist_tran.value,
                initialized.value,
                self.hist_weight,
                conv_head_on,
                lambda z: trans_cls_mod(z.astype(dt)).astype(jnp.float32),
            )
            if rep_gate is not None:
                # Traced scalar gate (0.0 before the reference's epoch-5
                # switch-on, 1.0 after — train_ACDC_scribblevc.py:219's
                # `epoch > 4`). One forward serves both phases: the naive
                # lax.cond over two full model applies doubled the saved-
                # activation footprint and blew HBM at bench batch sizes
                # (20.8G of 15.75G, RESULTS round 3).
                g = jnp.asarray(rep_gate, jnp.float32)
                dh = g * dh
                t_rep = g * t_rep
                new_hist = jnp.where(g > 0, new_hist, hist_conv.value)
                new_t_hist = jnp.where(g > 0, new_t_hist, hist_tran.value)
                new_init = jnp.where(
                    g > 0, jnp.ones((), jnp.float32), initialized.value
                )
            else:
                new_init = jnp.ones((), jnp.float32)
            hist_conv.value = new_hist
            hist_tran.value = new_t_hist
            h = h + dh.astype(dt)
            feature_conv[-1] = h
            x_patch = x_patch + t_rep[:, 1:].reshape(
                b, gh, gw, self.embed_dim
            ).astype(dt)
            initialized.value = new_init
        elif use_class_rep and not train:
            conv_prob = jax.nn.sigmoid(conv_cls)
            weight = jnp.where(conv_prob < 0.5, 0.0, conv_prob)
            h = h + jnp.einsum("ab,bhwc->ahwc", weight, hist_conv.value).astype(dt)
            feature_conv[-1] = h
            tran_prob = jax.nn.sigmoid(tran_cls)
            t_weight = jnp.where(tran_prob < 0.5, 0.0, tran_prob)
            t_rep = jnp.einsum("ab,bjk->ajk", t_weight, hist_tran.value)
            x_patch = x_patch + t_rep[:, 1:].reshape(
                b, gh, gw, self.embed_dim
            ).astype(dt)

        # ---- decoders (:377-482, :761-763) ----
        fc = feature_conv
        d = UNetUpBilinear(c2, c2, dt)(fc[4], fc[3], train=train)
        d = UNetUpBilinear(c1, c1, dt)(d, fc[2], train=train)
        d = UNetUpBilinear(c1 // 2, c1 // 2, dt)(d, fc[1], train=train)
        d = UNetUpBilinear(c1 // 4, c1 // 4, dt)(d, fc[0], train=train)
        seg_conv = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=dt,
            kernel_init=_kaiming_out,
        )(d).astype(jnp.float32)

        tchans = (32, 64, 128, 256)
        z = x_patch
        for feat in reversed(tchans):
            z = nn.Conv(
                feat, (1, 1), dtype=dt, kernel_init=_kaiming_out
            )(z)
            z = upsample2d(z, 2, "bilinear_ac")
        seg_trans = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=dt,
            kernel_init=_kaiming_out,
        )(z).astype(jnp.float32)

        return seg_conv, seg_trans, (conv_cls, tran_cls)
