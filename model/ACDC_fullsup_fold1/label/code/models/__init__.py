from .factory import (
    MODEL_NUM_OUTPUTS,
    PERTURBED_MODELS,
    apply_model,
    init_model,
    net_factory,
)
from .pnet import PNet2D
from .unet import (
    UNet,
    UNetCCT,
    UNetCCT3H,
    UNetDS,
    channel_dropout,
    feature_dropout,
    feature_noise,
)

__all__ = [
    "MODEL_NUM_OUTPUTS",
    "PERTURBED_MODELS",
    "apply_model",
    "init_model",
    "net_factory",
    "PNet2D",
    "UNet",
    "UNetCCT",
    "UNetCCT3H",
    "UNetDS",
    "channel_dropout",
    "feature_dropout",
    "feature_noise",
]
