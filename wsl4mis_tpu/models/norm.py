"""Throughput-oriented BatchNorm: f32 statistics, compute-dtype apply.

`flax.linen.BatchNorm(dtype=float32)` promotes the full activation tensor
to f32 for normalization, so every ConvBlock materializes f32 copies of
its (B, H, W, C) tensors — on TPU the step is memory-bound and this
doubles the activation bytes. `FusedBatchNorm` keeps the big tensors in
the compute dtype end to end:

  * batch mean / variance are computed by f32 *reductions* over the bf16
    input (XLA converts inside the fused reduce; nothing f32-sized is
    materialized);
  * the affine application collapses to one multiply-add with per-channel
    ``mul = scale / sqrt(var + eps)`` and ``add = bias - mean * mul``
    computed in f32 (C-sized, trivial) and cast to the compute dtype;
  * running statistics and scale/bias parameters stay f32, same
    collections ("batch_stats": mean/var, "params": scale/bias) and same
    momentum/epsilon semantics as flax BatchNorm, so checkpoints and
    parity tests are interchangeable.

Numerics: identical to flax BatchNorm up to bf16 rounding of the final
multiply-add (stats math is f32 in both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FusedBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None,
                 moments=None, lane_tile: int = 1):
        """moments: optional (s1, s2) per-channel f32 sums of x and x^2
        (e.g. from banded_conv3x3_pallas_stats' epilogue) — skips the
        full-tensor stats reduction; semantics identical to computing
        them here (same one-pass mean/var formula).

        lane_tile: >1 when x is a flat-chained GROUPED conv output whose
        minor dim packs lane_tile pixels x C channels (lane l -> channel
        l % C); the per-channel affine is tiled across the lanes. Requires
        moments (the per-channel stats cannot be read off the lane dim
        without a reduction)."""
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average,
        )
        c = x.shape[-1]
        if lane_tile > 1:
            assert moments is not None or use_ra
            assert c % lane_tile == 0
            c = c // lane_tile
        axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.size // c
            if moments is not None:
                s1, s2 = moments
                mean = s1 / n
                mean2 = s2 / n
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axes)
                mean2 = jnp.mean(jnp.square(xf), axes)
            # one-pass (fast) variance, clamped against cancellation
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                # flax stores the biased variance; keep that contract
                ra_var.value = m * ra_var.value + (1 - m) * var
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        if lane_tile > 1:
            mul = jnp.tile(mul, lane_tile)
            add = jnp.tile(add, lane_tile)
        return x * mul.astype(x.dtype) + add.astype(x.dtype)
