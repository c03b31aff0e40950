"""wsl4mis_tpu — TPU-native weakly-/semi-supervised medical image segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HiLab-git/WSL4MIS
(reference mounted at /root/reference): scribble-supervised cardiac MRI
segmentation on ACDC with a zoo of weakly- and semi-supervised training
strategies, volume-wise Dice/HD95/ASD evaluation, and a single Mesh-aware
data-parallel runtime instead of per-GPU processes.

Design stance (vs. the reference's 15 standalone PyTorch scripts):
  * one library: pure-functional jitted train steps, explicit PRNG keys,
    donated device buffers, optax optimizers, channels-last (NHWC) layouts;
  * augmentation runs on-device inside the jitted step (gather-based rot90 /
    flip / nearest rotate), keeping the host out of the hot path;
  * data parallelism over a `jax.sharding.Mesh` (ICI collectives inserted by
    XLA) replaces the reference's shell-level fold fan-out;
  * the hot custom op (GatedCRF pairwise Gaussian kernels) has both a fused
    XLA implementation and a Pallas TPU kernel.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (avoid importing jax at package import)."""
    if name == "TrainConfig":
        from .engine.config import TrainConfig

        return TrainConfig
    if name == "Trainer":
        from .engine.trainer import Trainer

        return Trainer
    if name == "get_method":
        from .engine.methods import get_method

        return get_method
    if name == "net_factory":
        from .models import net_factory

        return net_factory
    raise AttributeError(name)
