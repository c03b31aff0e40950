"""Optimizers and schedules with reference-parity semantics."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_lr(base_lr: float, max_iterations: int, power: float = 0.9):
    """lr = base * (1 - step/max)^power, stepped per iteration.

    Parity: train_fully_supervised_2D.py:108-110. The reference updates the
    LR *after* each optimizer step using the pre-increment iteration count,
    which is exactly optax's update count semantics (count starts at 0).
    """

    def schedule(count):
        frac = 1.0 - jnp.minimum(count, max_iterations) / max_iterations
        return base_lr * frac ** power

    return schedule


def reference_sgd(base_lr: float, max_iterations: int,
                  momentum: float = 0.9, weight_decay: float = 1e-4):
    """torch.optim.SGD(momentum=0.9, weight_decay=1e-4) + poly decay.

    torch applies weight decay additively to the gradient *before* the
    momentum accumulation; optax.add_decayed_weights before sgd reproduces
    that exactly (train_fully_supervised_2D.py:79-80).
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(poly_lr(base_lr, max_iterations), momentum=momentum),
    )


def reference_adam(lr: float = 1e-4, b1: float = 0.9, b2: float = 0.99):
    """torch.optim.Adam(lr=1e-4, betas=(0.9, 0.99)) — the DAN discriminator
    optimizer (train_deep_adversarial_network_2D.py:111-112)."""
    return optax.adam(lr, b1=b1, b2=b2, eps=1e-8)
