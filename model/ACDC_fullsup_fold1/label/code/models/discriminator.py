"""Discriminators for adversarial semi-supervised training.

FCDiscriminator parity (/root/reference/code/networks/discriminator.py:
58-101): dual-stem (segmentation softmax map + image) 4x4/stride-2 conv
classifier with LeakyReLU(0.2), channel dropout 0.5, 7x7 avg-pool and a
2-way linear head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import channel_dropout

Dtype = Any


def _torch_uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Conv4x4s2(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * 16
        bound = 1.0 / fan_in ** 0.5
        return nn.Conv(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            kernel_init=_torch_uniform(bound),
            bias_init=_torch_uniform(bound),
        )(x)


class FC3DDiscriminator(nn.Module):
    """3D volume discriminator (discriminator.py:6-55): dual-stem 4x4x4
    stride-2 conv classifier with LeakyReLU(0.2), channel dropout 0.5,
    6^3 avg-pool and a 2-way linear head."""

    num_classes: int = 2
    ndf: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, seg_map, image, *, train: bool = False):
        def conv(z, feat):
            fan_in = z.shape[-1] * 64
            bound = 1.0 / fan_in ** 0.5
            return nn.Conv(
                feat, (4, 4, 4), strides=(2, 2, 2),
                padding=((1, 1),) * 3, dtype=self.dtype,
                kernel_init=_torch_uniform(bound),
                bias_init=_torch_uniform(bound),
            )(z)

        def chan_drop(z):
            if not train:
                return z
            keep = jax.random.bernoulli(
                self.make_rng("feature_perturb"), 0.5,
                (z.shape[0], 1, 1, 1, z.shape[-1]),
            )
            return jnp.where(keep, z / 0.5, 0.0).astype(z.dtype)

        x = conv(seg_map, self.ndf) + conv(image, self.ndf)
        x = chan_drop(nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype))
        x = conv(x, self.ndf * 2)
        x = chan_drop(nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype))
        x = conv(x, self.ndf * 4)
        x = chan_drop(nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype))
        x = conv(x, self.ndf * 8)
        x = nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype)
        k = min(6, x.shape[1])  # 6^3 pool at the reference 96^3 input
        x = nn.avg_pool(x, (k, k, k), strides=(k, k, k))
        x = x.reshape(x.shape[0], -1)
        bound = 1.0 / x.shape[-1] ** 0.5
        return nn.Dense(
            2, dtype=self.dtype, kernel_init=_torch_uniform(bound),
            bias_init=_torch_uniform(bound),
        )(x).astype(jnp.float32)


class FCDiscriminator(nn.Module):
    num_classes: int = 4
    ndf: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, seg_map, image, *, train: bool = False):
        """seg_map: (B,H,W,C) softmax; image: (B,H,W,1). Returns (B,2)."""
        m = _Conv4x4s2(self.ndf, self.dtype)(seg_map)
        f = _Conv4x4s2(self.ndf, self.dtype)(image)
        x = m + f
        for mult in (2, 4):
            x = _Conv4x4s2(self.ndf * mult, self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype)
            if train:
                x = channel_dropout(self.make_rng("feature_perturb"), x, 0.5)
        x = _Conv4x4s2(self.ndf * 8, self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.2).astype(self.dtype)
        k = min(7, x.shape[1])  # 7x7 pool at the reference 256^2 input
        x = nn.avg_pool(x, (k, k), strides=(k, k))
        x = x.reshape(x.shape[0], -1)
        fan_in = x.shape[-1]
        bound = 1.0 / fan_in ** 0.5
        logits = nn.Dense(
            2,
            dtype=self.dtype,
            kernel_init=_torch_uniform(bound),
            bias_init=_torch_uniform(bound),
        )(x)
        return logits.astype(jnp.float32)
