"""Model factory mirroring the reference net_factory API.

Parity: /root/reference/code/networks/net_factory.py:6-22 — string-keyed
construction of the 2D model zoo. Returns a linen Module; parameter/state
initialization is the caller's job (functional JAX style), via `init_model`.

The reference's in_chns argument is implicit here: NHWC inputs carry their
channel count, and all reference call sites use in_chns=1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .efficientunet import EffiUNet
from .pnet import PNet2D
from .unet import UNet, UNetCCT, UNetCCT3H, UNetDS, UNetURDS

_REGISTRY = {
    "unet": UNet,
    "unet_cct": UNetCCT,
    "unet_cct_3h": UNetCCT3H,
    "unet_ds": UNetDS,
    "unet_urds": UNetURDS,
    "pnet": PNet2D,
    "efficient_unet": EffiUNet,
}

# Model types whose forward pass needs a 'feature_perturb' rng when training.
PERTURBED_MODELS = {"unet_cct", "unet_cct_3h", "unet_urds", "pnet"}

# Number of outputs returned by each model's __call__ (1 = single logits).
MODEL_NUM_OUTPUTS = {
    "unet": 1,
    "unet_cct": 2,
    "unet_cct_3h": 3,
    "unet_ds": 4,
    "unet_urds": 4,
    "pnet": 1,
    "efficient_unet": 1,
}


def net_factory(net_type: str = "unet", class_num: int = 4, dtype: Any = jnp.bfloat16):
    """Parity: networks/net_factory.py:6-22 (efficient_unet uses the
    'efficientnet-b3' encoder there; ImageNet weights are unavailable in
    this offline environment, so it initializes randomly)."""
    if net_type == "pnet":
        return PNet2D(num_classes=class_num, dtype=dtype)
    if net_type == "efficient_unet":
        return EffiUNet(
            encoder_name="efficientnet-b3", num_classes=class_num, dtype=dtype
        )
    try:
        cls = _REGISTRY[net_type]
    except KeyError:
        raise KeyError(
            f"unknown net_type {net_type!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return cls(num_classes=class_num, dtype=dtype)


def init_model(model, rng, input_shape=(1, 256, 256, 1)):
    """Initialize variables = {'params', 'batch_stats'} for a model."""
    dummy = jnp.zeros(input_shape, jnp.float32)
    init_rngs = {"params": rng, "dropout": rng, "feature_perturb": rng}
    variables = model.init(init_rngs, dummy, train=False)
    return variables


def apply_model(model, variables, x, *, train: bool, rngs=None, mutable=None):
    """Thin wrapper so callers don't repeat the collections plumbing."""
    if mutable is None:
        mutable = ["batch_stats"] if train else False
    return model.apply(variables, x, train=train, rngs=rngs, mutable=mutable)
