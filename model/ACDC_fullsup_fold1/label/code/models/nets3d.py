"""3D segmentation model family (NDHWC, Flax).

Rebuilds the reference 3D zoo consumed via net_factory_3d
(/root/reference/code/networks/net_factory_3d.py:7-20):

  * unet_3D         — networks/unet_3D.py:20-100: UnetConv3 stages
    (3x3x3 conv + InstanceNorm + ReLU, networks/utils.py:99-123) with
    filters [64,128,256,512,1024]/feature_scale, maxpool-2 downsampling,
    trilinear-upsample+concat decoder (UnetUp3_CT, utils.py:260-277),
    dropout 0.3 at the center and before the 1x1 head.
  * Attention_UNet  — networks/attention_unet.py:9-110: grid-attention
    gated skips (two parallel gates fused by a 1x1+BN+ReLU,
    MultiAttentionBlock :113-135) and deep supervision via per-scale
    1x1 + trilinear upsample heads fused by a final 1x1.
  * VNet            — networks/vnet.py:145-239: 5-level encoder with
    (1,2,3,3,3)-stage conv blocks, stride-2 conv down / deconv up,
    additive skips, optional channel dropout 0.5.
  * VoxResNet       — networks/VoxResNet.py:79-116: pre-activation
    residual blocks (InstanceNorm+ReLU+3x3x3, bias-free) at 3 scales with
    trilinear(align_corners=True) upsampling fusion.

torch InstanceNorm3d defaults (affine=False, no running stats) are kept:
instance norm here is a stateless per-sample, per-channel normalization.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm3d(affine=False): normalize over spatial dims."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x.astype(jnp.float32), axis=axes, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=axes, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _interp_axis(x, axis, out_size, align_corners):
    """1D linear interpolation along one axis (align_corners selectable)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners and out_size > 1:
        src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(x.dtype)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return xl * (1 - w) + xh * w


def upsample3d(x, factor=2, align_corners: bool = False):
    """Trilinear upsampling of NDHWC by an integer factor."""
    for axis in (1, 2, 3):
        x = _interp_axis(x, axis, x.shape[axis] * factor, align_corners)
    return x


def maxpool3d(x, k: int = 2):
    return nn.max_pool(x, (k, k, k), strides=(k, k, k))


class Conv3(nn.Module):
    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (1, 1, 1)
    use_bias: bool = True
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_kaiming, bias_init=nn.initializers.zeros,
        )(x)


class UnetConv3(nn.Module):
    """Two (conv3x3x3 -> InstanceNorm -> ReLU) stages (utils.py:99-123)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = Conv3(self.features, dtype=self.dtype)(x)
            x = nn.relu(instance_norm(x))
        return x


class UnetUp3CT(nn.Module):
    """Trilinear x2 upsample, concat skip, UnetConv3 (utils.py:260-277)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skip, deep):
        up = upsample3d(deep, 2, align_corners=False)
        x = jnp.concatenate([skip, up], axis=-1)
        return UnetConv3(self.features, self.dtype)(x)


class UNet3D(nn.Module):
    num_classes: int = 2
    feature_scale: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(c / self.feature_scale) for c in (64, 128, 256, 512, 1024)]
        c1 = UnetConv3(f[0], self.dtype)(x)
        c2 = UnetConv3(f[1], self.dtype)(maxpool3d(c1))
        c3 = UnetConv3(f[2], self.dtype)(maxpool3d(c2))
        c4 = UnetConv3(f[3], self.dtype)(maxpool3d(c3))
        center = UnetConv3(f[4], self.dtype)(maxpool3d(c4))
        center = nn.Dropout(0.3, deterministic=not train)(center)
        u4 = UnetUp3CT(f[3], self.dtype)(c4, center)
        u3 = UnetUp3CT(f[2], self.dtype)(c3, u4)
        u2 = UnetUp3CT(f[1], self.dtype)(c2, u3)
        u1 = UnetUp3CT(f[0], self.dtype)(c1, u2)
        u1 = nn.Dropout(0.3, deterministic=not train)(u1)
        logits = Conv3(self.num_classes, (1, 1, 1), dtype=self.dtype)(u1)
        return logits.astype(jnp.float32)


class GridAttentionBlock3D(nn.Module):
    """'concatenation' grid attention gate (grid_attention_layer.py:84-107)."""

    inter_channels: int
    sub_sample: tuple = (2, 2, 2)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        theta_x = Conv3(
            self.inter_channels, self.sub_sample, self.sub_sample,
            use_bias=False, padding="VALID", dtype=self.dtype,
        )(x)
        phi_g = Conv3(self.inter_channels, (1, 1, 1), dtype=self.dtype)(g)
        # resize phi_g onto theta's grid (F.upsample(..., size=theta))
        tgt = theta_x.shape[1:4]
        for axis, size in zip((1, 2, 3), tgt):
            phi_g = _interp_axis(phi_g, axis, size, align_corners=False)
        f = nn.relu(theta_x + phi_g)
        att = jax.nn.sigmoid(Conv3(1, (1, 1, 1), dtype=self.dtype)(f))
        for axis, size in zip((1, 2, 3), x.shape[1:4]):
            att = _interp_axis(att, axis, size, align_corners=False)
        y = att * x
        w_y = Conv3(in_ch, (1, 1, 1), dtype=self.dtype)(y)
        w_y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(w_y).astype(self.dtype)
        return w_y, att


class MultiAttentionBlock(nn.Module):
    """Two parallel gates fused by 1x1+BN+ReLU (attention_unet.py:113-135)."""

    inter_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        g1, a1 = GridAttentionBlock3D(self.inter_channels, dtype=self.dtype)(
            x, g, train=train
        )
        g2, a2 = GridAttentionBlock3D(self.inter_channels, dtype=self.dtype)(
            x, g, train=train
        )
        h = jnp.concatenate([g1, g2], axis=-1)
        h = Conv3(in_ch, (1, 1, 1), dtype=self.dtype)(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(h)
        return nn.relu(h).astype(self.dtype), jnp.concatenate([a1, a2], -1)


class AttentionUNet3D(nn.Module):
    num_classes: int = 2
    feature_scale: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [int(c / self.feature_scale) for c in (64, 128, 256, 512, 1024)]
        c1 = UnetConv3(f[0], self.dtype)(x)
        c2 = UnetConv3(f[1], self.dtype)(maxpool3d(c1))
        c3 = UnetConv3(f[2], self.dtype)(maxpool3d(c2))
        c4 = UnetConv3(f[3], self.dtype)(maxpool3d(c3))
        center = UnetConv3(f[4], self.dtype)(maxpool3d(c4))
        # gating signal: 1x1x1 conv + IN + ReLU (utils.py:192-214)
        gating = nn.relu(
            instance_norm(Conv3(f[4], (1, 1, 1), dtype=self.dtype)(center))
        )
        g4, _ = MultiAttentionBlock(f[3], self.dtype)(c4, gating, train=train)
        u4 = UnetUp3CT(f[3], self.dtype)(g4, center)
        g3, _ = MultiAttentionBlock(f[2], self.dtype)(c3, u4, train=train)
        u3 = UnetUp3CT(f[2], self.dtype)(g3, u4)
        g2, _ = MultiAttentionBlock(f[1], self.dtype)(c2, u3, train=train)
        u2 = UnetUp3CT(f[1], self.dtype)(g2, u3)
        u1 = UnetUp3CT(f[0], self.dtype)(c1, u2)

        def dsv(z, scale):
            z = Conv3(self.num_classes, (1, 1, 1), dtype=self.dtype)(z)
            return upsample3d(z, scale, align_corners=False) if scale > 1 else z

        d4 = dsv(u4, 8)
        d3 = dsv(u3, 4)
        d2 = dsv(u2, 2)
        d1 = Conv3(self.num_classes, (1, 1, 1), dtype=self.dtype)(u1)
        fused = jnp.concatenate([d1, d2, d3, d4], axis=-1)
        logits = Conv3(self.num_classes, (1, 1, 1), dtype=self.dtype)(fused)
        return logits.astype(jnp.float32)


class VNet(nn.Module):
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "batchnorm"
    has_dropout: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False, turnoff_drop: bool = False):
        nf = self.n_filters
        dt = self.dtype
        drop = self.has_dropout and train and not turnoff_drop

        def norm(z):
            if self.normalization == "batchnorm":
                return nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32,
                )(z).astype(dt)
            if self.normalization == "groupnorm":
                return nn.GroupNorm(num_groups=16, dtype=jnp.float32)(z).astype(dt)
            if self.normalization == "instancenorm":
                return instance_norm(z)
            return z

        def conv_block(z, n_stages, feat):
            for _ in range(n_stages):
                z = Conv3(feat, dtype=dt)(z)
                z = nn.relu(norm(z))
            return z

        def down(z, feat):
            z = Conv3(feat, (2, 2, 2), (2, 2, 2), padding="VALID", dtype=dt)(z)
            return nn.relu(norm(z))

        def up(z, feat):
            z = nn.ConvTranspose(
                feat, (2, 2, 2), strides=(2, 2, 2), dtype=dt,
                kernel_init=_kaiming,
            )(z)
            return nn.relu(norm(z))

        def chan_dropout(z):
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 0.5,
                (z.shape[0], 1, 1, 1, z.shape[-1]),
            )
            return jnp.where(keep, z / 0.5, 0.0).astype(z.dtype)

        # encoder (vnet.py:150-200)
        x1 = conv_block(x, 1, nf)
        x2 = conv_block(down(x1, nf * 2), 2, nf * 2)
        x3 = conv_block(down(x2, nf * 4), 3, nf * 4)
        x4 = conv_block(down(x3, nf * 8), 3, nf * 8)
        x5 = conv_block(down(x4, nf * 16), 3, nf * 16)
        if drop:
            x5 = chan_dropout(x5)
        # decoder with additive skips (vnet.py:204-228)
        x6 = conv_block(up(x5, nf * 8) + x4, 3, nf * 8)
        x7 = conv_block(up(x6, nf * 4) + x3, 3, nf * 4)
        x8 = conv_block(up(x7, nf * 2) + x2, 2, nf * 2)
        x9 = conv_block(up(x8, nf) + x1, 1, nf)
        if drop:
            x9 = chan_dropout(x9)
        logits = Conv3(self.num_classes, (1, 1, 1), dtype=dt)(x9)
        return logits.astype(jnp.float32)


class VoxRex(nn.Module):
    """Pre-activation residual block (VoxResNet.py:26-41)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(instance_norm(x))
        h = Conv3(self.features, use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))
        h = Conv3(self.features, use_bias=False, dtype=self.dtype)(h)
        return h + x


class VoxResNet(nn.Module):
    feature_chns: int = 64
    num_classes: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fc = self.feature_chns
        dt = self.dtype

        def preact_block(z, feat):
            z = nn.relu(instance_norm(z))
            z = Conv3(feat, use_bias=False, dtype=dt)(z)
            z = nn.relu(instance_norm(z))
            return Conv3(feat, use_bias=False, dtype=dt)(z)

        x0 = maxpool3d(Conv3(fc, dtype=dt)(x))
        x1 = VoxRex(fc, dt)(x0)
        x2 = VoxRex(fc, dt)(x1)
        x2_pool = maxpool3d(x2)
        x3 = VoxRex(fc, dt)(x2_pool)
        x4 = maxpool3d(VoxRex(fc, dt)(x3))
        x5 = VoxRex(fc, dt)(x4)
        x6 = VoxRex(fc, dt)(x5)
        # UpBlock: trilinear(align_corners=True) + concat + pre-act conv
        u1_in = jnp.concatenate(
            [x2_pool, upsample3d(x6, 2, align_corners=True)], axis=-1
        )
        u1 = preact_block(u1_in, fc)
        u2_in = jnp.concatenate(
            [x0, upsample3d(u1, 2, align_corners=True)], axis=-1
        )
        u2 = preact_block(u2_in, fc)
        up = upsample3d(u2, 2, align_corners=True)
        logits = Conv3(self.num_classes, (1, 1, 1), dtype=dt)(up)
        return logits.astype(jnp.float32)


def net_factory_3d(net_type: str = "unet_3D", class_num: int = 2,
                   dtype: Any = jnp.bfloat16):
    """Parity with networks/net_factory_3d.py:7-20."""
    if net_type == "unet_3D":
        return UNet3D(num_classes=class_num, dtype=dtype)
    if net_type == "attention_unet":
        return AttentionUNet3D(num_classes=class_num, dtype=dtype)
    if net_type == "voxresnet":
        return VoxResNet(feature_chns=64, num_classes=class_num, dtype=dtype)
    if net_type == "vnet":
        return VNet(num_classes=class_num, normalization="batchnorm",
                    has_dropout=True, dtype=dtype)
    raise KeyError(f"unknown 3D net_type {net_type!r}")
