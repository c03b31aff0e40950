"""PNet2D (DeepIGeoS P-Net) — dilated conv stack with concat fusion.

Parity with /root/reference/code/networks/pnet.py: five PNetBlocks
(two dilated 3x3 convs + BN + LeakyReLU each) at dilations [1,2,4,8,16],
feature concat, 1x1 fusion block, and a dropout'ed 1x1 output head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .unet import TorchConv, channel_dropout

Dtype = Any


class DilatedConv(nn.Module):
    features: int
    dilation: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * 9
        bound = 1.0 / (fan_in ** 0.5)

        def init(key, shape, dtype=jnp.float32):
            import jax

            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Conv(
            self.features,
            (3, 3),
            padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
            kernel_init=init,
            bias_init=init,
        )(x)


class PNetBlock(nn.Module):
    features: int
    dilation: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        for _ in range(2):
            x = DilatedConv(self.features, self.dilation, self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        return x


class PNet2D(nn.Module):
    num_classes: int = 4
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 4, 8, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = []
        h = x
        for r in self.ratios:
            h = PNetBlock(self.num_filters, r, self.dtype)(h, train=train)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        # ConcatBlock: two 1x1 convs with LeakyReLU (pnet.py:44-61)
        h = TorchConv(self.num_filters * 5, (1, 1), self.dtype)(h)
        h = nn.leaky_relu(h, negative_slope=0.01).astype(self.dtype)
        h = TorchConv(self.num_filters * 2, (1, 1), self.dtype)(h)
        h = nn.leaky_relu(h, negative_slope=0.01).astype(self.dtype)
        # OutPutBlock: Dropout2d(0.3) -> 1x1 -> LeakyReLU -> Dropout2d -> 1x1
        if train:
            rng = self.make_rng("feature_perturb")
            import jax

            k1, k2 = jax.random.split(rng)
            h = channel_dropout(k1, h, 0.3)
            h = TorchConv(self.num_filters, (1, 1), self.dtype)(h)
            h = nn.leaky_relu(h, negative_slope=0.01).astype(self.dtype)
            h = channel_dropout(k2, h, 0.3)
        else:
            h = TorchConv(self.num_filters, (1, 1), self.dtype)(h)
            h = nn.leaky_relu(h, negative_slope=0.01).astype(self.dtype)
        logits = TorchConv(self.num_classes, (1, 1), self.dtype)(h)
        return logits.astype(jnp.float32)
