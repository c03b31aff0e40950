"""Shared training configuration.

One dataclass replaces the ~15 duplicated argparse blocks of the reference
(e.g. /root/reference/code/train_fully_supervised_2D.py:29-53). Field names
keep the reference CLI flag names so the thin script wrappers map 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class TrainConfig:
    # --- reference CLI flags (train_fully_supervised_2D.py:29-53) ---
    root_path: str | None = None        # None -> data.default_acdc_root()
    exp: str = "ACDC"
    fold: str = "fold1"
    sup_type: str = "label"
    model: str = "unet"
    num_classes: int = 4
    max_iterations: int = 30000
    batch_size: int = 16
    deterministic: int = 1
    base_lr: float = 0.03
    patch_size: tuple[int, int] = (256, 256)
    seed: int = 2022

    # --- semi-supervised flags (train_mean_teacher_2D.py:50-69) ---
    labeled_bs: int = 8
    ema_decay: float = 0.99
    consistency: float = 0.1
    consistency_rampup: float = 200.0

    # --- scribble2label flags (train_s2l.py:50-66) ---
    thr_iter: int = 6000
    thr_conf: float = 0.8
    period_iter: int = 100
    alpha: float = 0.2

    # --- rebuild-specific knobs ---
    method: str = "fully_supervised"
    snapshot_root: str = "model"        # reference writes ../model
    val_every: int = 200
    ckpt_every: int = 3000
    log_every: int = 1
    compute_dtype: str = "bfloat16"     # bfloat16 | float32
    num_devices: int | None = None      # None -> all local devices
    resume: bool = False
    profile_steps: int = 0              # >0: capture a jax profiler trace
    data_limit: int | None = None       # cap dataset size (tests/smoke)
    device_data: bool = True            # stage the dataset in HBM; batches
                                        # become on-device index gathers
    aug_mode: str = "device"            # "device" (in-step, default) or
                                        # "host" (exact reference semantics:
                                        # aug at native res, then zoom)
    debug_nans: bool = False            # jax_debug_nans (SURVEY §5.2)
    fast_prng: bool = True              # 'rbg' impl for the step PRNG key:
                                        # much cheaper random bits on TPU
    remat: bool = False                 # checkpoint transformer stages
                                        # (ScribbleVC): recompute in bwd,
                                        # trading ~1 fwd of FLOPs for HBM
                                        # batch headroom
                                        # (dropout masks dominate otherwise).
                                        # Still keyed+deterministic; stream
                                        # differs from threefry.
    steps_per_call: int = 1             # lax.scan K train steps inside one
                                        # device call (amortizes dispatch
                                        # latency; val/ckpt/log cadences are
                                        # rounded to multiples of K)
    light_val: bool = False             # skip the train-rule val pass
                                        # when a select_predictor exists
                                        # (selection never reads it; val
                                        # dominates ScribbleVC wall-clock)
    encoder_weights: str | None = None  # efficient_unet: msgpack from
                                        # scripts/convert_torch_weights.py
                                        # (the reference's ImageNet warm
                                        # start, net_factory.py:16 — no
                                        # egress here, so weights arrive
                                        # via local file conversion)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    @property
    def snapshot_path(self) -> str:
        # reference layout: ../model/{exp}_{fold}/{sup_type}
        return f"{self.snapshot_root}/{self.exp}_{self.fold}/{self.sup_type}"
