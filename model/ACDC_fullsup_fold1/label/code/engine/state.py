"""Functional train state: params + BN stats + optimizer + method extras."""

from __future__ import annotations

from typing import Any, Callable

import jax
from flax import struct
import optax


class TrainState(struct.PyTreeNode):
    """Immutable training state threaded through the jitted step.

    `extra` carries method-specific device state (EMA teacher params,
    discriminator params+opt state, the S2L per-pixel probability buffer...)
    so every method shares one step-function signature.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    extra: Any = None

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx, extra=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            extra=extra,
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads, *, batch_stats=None, extra=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
            extra=self.extra if extra is None else extra,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def ema_update(teacher_params, student_params, alpha: float, global_step):
    """Mean-teacher EMA with warmup: alpha' = min(1 - 1/(step+1), alpha).

    Parity: update_ema_variables (train_weakly_supervised_ustm_2D.py:61-65).
    Note: the mean_teacher/UAMT scripts define but never call this in the
    mounted snapshot (SURVEY §0.9); we apply it per-step as USTM does and
    as the method intends.
    """
    import jax.numpy as jnp

    a = jnp.minimum(1.0 - 1.0 / (global_step.astype(jnp.float32) + 1.0), alpha)
    return jax.tree.map(
        lambda t, s: (t * a + (1.0 - a) * s).astype(t.dtype),
        teacher_params,
        student_params,
    )
