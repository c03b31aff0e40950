"""Intermediate-activation extraction.

The reference's HookBasedFeatureExtractor (networks/utils.py:401-445)
registers forward hooks on a torch submodule; the functional-JAX
equivalent uses flax's capture_intermediates to pull any named module's
inputs/outputs out of a single apply, with optional nearest rescaling to
a target spatial size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_features(model, variables, x, layer_name: str | None = None,
                     upscale_to=None, **apply_kwargs):
    """Run `model.apply` capturing intermediates.

    Returns (outputs, features) where features maps flattened module paths
    to activation arrays; filter with `layer_name` (substring match).
    """
    outputs, state = model.apply(
        variables, x, capture_intermediates=True,
        mutable=["intermediates"], **apply_kwargs,
    )
    feats = {}

    def visit(path, value):
        name = "/".join(str(p) for p in path)
        if layer_name is None or layer_name in name:
            feats[name] = value

    flat = jax.tree_util.tree_flatten_with_path(
        state["intermediates"], is_leaf=lambda x: isinstance(x, jnp.ndarray)
    )[0]
    for path, value in flat:
        visit([getattr(p, "key", getattr(p, "idx", p)) for p in path], value)

    if upscale_to is not None:
        feats = {
            k: jax.image.resize(
                v, (v.shape[0], *upscale_to, v.shape[-1]), "nearest"
            )
            if v.ndim == 4
            else v
            for k, v in feats.items()
        }
    return outputs, feats
