"""EfficientNet-UNet (`efficient_unet` in the factory).

Rebuilds /root/reference/code/networks/efficientunet.py +
efficient_encoder.py: an EfficientNet-B0..B7 encoder with stage feature
taps at strides 2/4/8/16/32, and a U-Net decoder of nearest-x2 upsampling
DecoderBlocks (3x3 conv + BN + ReLU twice, optional scSE attention)
over channels (256, 128, 64, 32, 16), finished by a 1x1 classifier
(Effi_UNet, efficientunet.py:143-215).

EfficientNet details matched to efficientnet_pytorch semantics: MBConv
with expansion/SE(0.25)/projection, swish activations, BatchNorm
(momentum 0.01, eps 1e-3), stochastic depth linearly ramped to
drop_connect_rate across blocks, width/depth compound scaling with
round_filters/round_repeats.

The reference loads ImageNet weights (net_factory.py:16); this environment
has no network egress, so encoders initialize randomly (a local msgpack
checkpoint can be loaded through the normal checkpoint utilities instead).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (width_coefficient, depth_coefficient, drop_connect_rate)
_SCALING = {
    "efficientnet-b0": (1.0, 1.0, 0.2),
    "efficientnet-b1": (1.0, 1.1, 0.2),
    "efficientnet-b2": (1.1, 1.2, 0.3),
    "efficientnet-b3": (1.2, 1.4, 0.3),
    "efficientnet-b4": (1.4, 1.8, 0.4),
    "efficientnet-b5": (1.6, 2.2, 0.4),
    "efficientnet-b6": (1.8, 2.6, 0.5),
    "efficientnet-b7": (2.0, 3.1, 0.5),
}

# (expand_ratio, kernel, stride, in_filters, out_filters, repeats)
_BASE_BLOCKS = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(train: bool):
    # efficientnet_pytorch: BatchNorm(momentum=0.01 torch-style, eps=1e-3)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=jnp.float32,
    )


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    stride: int
    out_filters: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_ch = x.shape[-1]
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(
                in_ch * self.expand_ratio, (1, 1), use_bias=False,
                dtype=self.dtype,
            )(h)
            h = nn.swish(_bn(train)(h)).astype(self.dtype)
        # depthwise
        ch = h.shape[-1]
        h = nn.Conv(
            ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=ch, use_bias=False, dtype=self.dtype,
        )(h)
        h = nn.swish(_bn(train)(h)).astype(self.dtype)
        # squeeze-excite
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(se_ch, (1, 1), dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Conv(ch, (1, 1), dtype=self.dtype)(s))
        h = h * s
        # project
        h = nn.Conv(self.out_filters, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = _bn(train)(h).astype(self.dtype)
        if self.stride == 1 and in_ch == self.out_filters:
            if train and self.drop_rate > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.drop_rate,
                    (h.shape[0], 1, 1, 1),
                )
                h = jnp.where(keep, h / (1.0 - self.drop_rate), 0.0).astype(
                    h.dtype
                )
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """Returns [x, stem, s4, s8, s16, s32] feature taps
    (EfficientNetEncoder.forward, efficient_encoder.py:83-103)."""

    model_name: str = "efficientnet-b3"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        width, depth, drop_connect = _SCALING[self.model_name]
        features = [x]
        h = nn.Conv(
            round_filters(32, width), (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        h = nn.swish(_bn(train)(h)).astype(self.dtype)
        features.append(h)

        repeats = [round_repeats(r, depth) for *_stuff, r in _BASE_BLOCKS]
        total_blocks = sum(repeats)
        tap_groups = {1, 2, 4, 6}  # after groups 2, 3, 5, 7 (0-indexed)
        block_idx = 0
        for gi, (e, k, s, _fin, fout, _r) in enumerate(_BASE_BLOCKS):
            out = round_filters(fout, width)
            for j in range(repeats[gi]):
                rate = drop_connect * block_idx / total_blocks
                h = MBConv(
                    e, k, s if j == 0 else 1, out, drop_rate=rate,
                    dtype=self.dtype,
                )(h, train=train)
                block_idx += 1
            if gi in tap_groups:
                features.append(h)
        return features


class DecoderBlock(nn.Module):
    out_channels: int
    attention: str | None = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            x = self._attend(x, train)
        for _ in range(2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype,
            )(x)
            x = nn.relu(_bn(train)(x)).astype(self.dtype)
        if skip is None:
            x = self._attend(x, train)
        return x

    def _attend(self, x, train):
        if self.attention != "scse":
            return x
        # scSE: channel-SE + spatial-SE (networks/attention.py semantics)
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(max(1, c // 16), (1, 1), dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype)(s))
        sp = jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype)(x))
        return x * s + x * sp


class EffiUNet(nn.Module):
    encoder_name: str = "efficientnet-b3"
    num_classes: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention: str | None = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = EfficientNetEncoder(self.encoder_name, self.dtype)(
            x.astype(self.dtype), train=train
        )
        # drop the full-res input tap, reverse (UnetDecoder, :86-139)
        feats = feats[1:][::-1]
        h = feats[0]
        skips = feats[1:]
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            h = DecoderBlock(out_ch, self.attention, self.dtype)(
                h, skip, train=train
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(h)
        return logits.astype(jnp.float32)
