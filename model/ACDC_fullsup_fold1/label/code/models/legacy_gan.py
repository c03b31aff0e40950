"""Legacy GAN building blocks (reference networks/networks_other.py).

The reference carries a pix2pix/CycleGAN-era toolbox whose only live use
is weight init for the 3D nets; the generators/discriminators are dead
code there but part of the component inventory (SURVEY §2.2):

  * init schemes normal/xavier/kaiming/orthogonal (:64-92) -> initializer
    selector for flax modules;
  * get_scheduler lambda/step/plateau (:95-110) -> optax schedules;
  * GANLoss (:260-298) — BCE (vanilla) or MSE (lsgan) against real/fake
    targets;
  * ResnetGenerator (:301-397) — c7s1-64, 2 stride-2 downs, N residual
    blocks, 2 ups, c7s1-out + tanh;
  * UnetGenerator (:400-478) — recursive skip-connected encoder/decoder;
  * NLayerDiscriminator (:481-529) — PatchGAN.

NHWC flax implementations, instance-norm by default like the originals.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
import optax

Dtype = Any


def select_initializer(init_type: str = "normal"):
    """networks_other.init_weights schemes as flax kernel initializers."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=0.02)
    if init_type == "xavier":
        return nn.initializers.xavier_normal()
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=1.0)
    raise NotImplementedError(f"init method {init_type!r}")


def get_schedule(policy: str, base_lr: float, *, niter: int = 100,
                 niter_decay: int = 100, lr_decay_iters: int = 50):
    """networks_other.get_scheduler equivalents as optax schedules.

    'lambda': constant for `niter` epochs then linear decay to 0 over
    `niter_decay`; 'step': x0.1 every lr_decay_iters.
    """
    if policy == "lambda":
        def sched(count):
            frac = jnp.clip(
                (count - niter + 1) / float(niter_decay + 1), 0.0, 1.0
            )
            return base_lr * (1.0 - frac)

        return sched
    if policy == "step":
        return optax.exponential_decay(
            base_lr, transition_steps=lr_decay_iters, decay_rate=0.1,
            staircase=True,
        )
    raise NotImplementedError(f"lr policy {policy!r}")


def gan_loss(logits, target_is_real: bool, use_lsgan: bool = True):
    """GANLoss parity: MSE against 1/0 (lsgan) or BCE-with-logits."""
    target = jnp.full_like(logits, 1.0 if target_is_real else 0.0)
    if use_lsgan:
        return jnp.mean((logits - target) ** 2)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))


def _instance_norm2d(x, eps=1e-5):
    mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class _Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=self.pad,
            dtype=self.dtype, kernel_init=select_initializer("normal"),
        )(x)


class ResnetBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = _Conv(self.features, 3, dtype=self.dtype)(x)
        h = nn.relu(_instance_norm2d(h))
        if train:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 0.5, h.shape
            )
            h = jnp.where(keep, h / 0.5, 0.0).astype(h.dtype)
        h = _Conv(self.features, 3, dtype=self.dtype)(h)
        return x + _instance_norm2d(h)


class ResnetGenerator(nn.Module):
    out_channels: int = 1
    ngf: int = 64
    n_blocks: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = _Conv(self.ngf, 7, dtype=self.dtype)(x)
        h = nn.relu(_instance_norm2d(h))
        for mult in (2, 4):
            h = _Conv(self.ngf * mult, 3, 2, dtype=self.dtype)(h)
            h = nn.relu(_instance_norm2d(h))
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.dtype)(h, train=train)
        for mult in (2, 1):
            h = nn.ConvTranspose(
                self.ngf * mult, (3, 3), strides=(2, 2), dtype=self.dtype,
                kernel_init=select_initializer("normal"),
            )(h)
            h = nn.relu(_instance_norm2d(h))
        h = _Conv(self.out_channels, 7, dtype=self.dtype)(h)
        return jnp.tanh(h)


class _UnetLevel(nn.Module):
    outer: int
    inner: int
    depth: int
    innermost: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        down = _Conv(self.inner, 4, 2, dtype=self.dtype)(
            nn.leaky_relu(x, 0.2)
        )
        down = _instance_norm2d(down)
        if self.innermost or self.depth <= 1:
            mid = down
        else:
            mid = _UnetLevel(
                self.inner, min(self.inner * 2, 512), self.depth - 1,
                innermost=(self.depth - 1 <= 1), dtype=self.dtype,
            )(down, train=train)
        up = nn.ConvTranspose(
            self.outer, (4, 4), strides=(2, 2), dtype=self.dtype,
            kernel_init=select_initializer("normal"),
        )(nn.relu(mid))
        up = _instance_norm2d(up)
        return jnp.concatenate([x, up], axis=-1)


class UnetGenerator(nn.Module):
    out_channels: int = 1
    num_downs: int = 7
    ngf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = _UnetLevel(self.ngf, self.ngf * 2, self.num_downs - 1,
                       dtype=self.dtype)(x, train=train)
        h = _Conv(self.out_channels, 3, dtype=self.dtype)(h)
        return jnp.tanh(h)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (networks_other.py:481-529)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(_Conv(self.ndf, 4, 2, dtype=self.dtype)(x), 0.2)
        mult = 1
        for _ in range(1, self.n_layers):
            mult = min(mult * 2, 8)
            h = _Conv(self.ndf * mult, 4, 2, dtype=self.dtype)(h)
            h = nn.leaky_relu(_instance_norm2d(h), 0.2)
        mult = min(mult * 2, 8)
        h = _Conv(self.ndf * mult, 4, 1, dtype=self.dtype)(h)
        h = nn.leaky_relu(_instance_norm2d(h), 0.2)
        return _Conv(1, 4, 1, dtype=self.dtype)(h)
