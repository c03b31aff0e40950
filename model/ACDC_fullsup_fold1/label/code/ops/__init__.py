from . import losses, ramps
from .gated_crf import gated_crf_loss

__all__ = ["losses", "ramps", "gated_crf_loss"]
