"""Checkpoint save/load (msgpack pytrees) with reference-compatible naming.

The reference saves torch state_dicts as `iter_{n}.pth`,
`iter_{n}_dice_{d}.pth` and `{model}_best_model.pth`
(train_fully_supervised_2D.py:152-170) and never resumes. The rebuild keeps
the file-name contract (payload is flax msgpack, not pickle) and adds full
resume: `latest_full.ckpt` carries params + BN stats + optimizer state +
method extras + step (SURVEY §5.3-5.4).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def save_model_checkpoint(path: str, state, eval_extra=None) -> None:
    """Inference checkpoint: params + batch_stats (the reference's
    state_dict equivalent), plus the method-declared eval-time variable
    collections from state.extra (MethodBundle.eval_extra — e.g.
    ScribbleVC's class_memory: scribbleVC_ACDC.py keeps its prototypes in
    module buffers, so a torch state_dict carries them; the flax
    equivalent lives in state.extra). Training-only extras (EMA teachers,
    S2L's whole-dataset weight buffer) are deliberately NOT persisted here
    — they live in the full resumable checkpoint (save_train_state).

    eval_extra: iterable of state.extra keys to persist. Default (None)
    keeps back-compat with direct callers: class_memory if present.
    """
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }
    extra = getattr(state, "extra", None) or {}
    keys = tuple(eval_extra) if eval_extra is not None else ("class_memory",)
    for k in keys:
        if k in extra:
            payload[k] = extra[k]
        elif eval_extra is not None:
            raise KeyError(
                f"eval_extra key {k!r} not in state.extra "
                f"({sorted(extra)}); inference checkpoint would be "
                "missing a collection the eval forward needs"
            )
    save_checkpoint(path, payload)


def save_train_state(path: str, state) -> None:
    """Full resumable state."""
    save_checkpoint(
        path,
        {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "extra": state.extra,
        },
    )


def restore_train_state(path: str, state):
    """Restore into an existing TrainState template (same method/config)."""
    target = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "extra": state.extra,
    }
    restored = load_checkpoint(path, target)
    return state.replace(**restored)
