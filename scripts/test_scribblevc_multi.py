#!/usr/bin/env python
"""Held-out MAAG test (test_ACDC_scribblevc protocol) over several
checkpoints in one process (amortizes the tunnel/compile startup)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.acdc import AcdcVolumeDataset, maag_test_ids
from wsl4mis_tpu.eval.metrics import calculate_metric_percase_spacing
from wsl4mis_tpu.eval.val2d import VolumePredictor
from wsl4mis_tpu.models.scribblevc import ScribbleVC
from wsl4mis_tpu.utils.checkpoint import load_checkpoint

SNAP = sys.argv[1] if len(sys.argv) > 1 else \
    "model/ACDC_ScribbleVC_MAAGfold/scribble"
CKPTS = sys.argv[2:] or [
    "scribblevc_best_model.pth", "iter_10900.pth", "iter_21800.pth"
]


def mean_softmax_decision(outputs):
    p1 = jax.nn.softmax(outputs[0], axis=-1)
    p2 = jax.nn.softmax(outputs[1], axis=-1)
    return jnp.argmax(0.5 * (p1 + p2), axis=-1)


def main():
    model = ScribbleVC(num_classes=4, dtype=jnp.bfloat16)
    init = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, 256, 256, 1), jnp.float32), train=False,
    )
    zero_mem = jax.tree.map(jnp.zeros_like, init["class_memory"])
    predictor = VolumePredictor(
        model, (256, 256), decision_fn=mean_softmax_decision,
        apply_kwargs={"use_class_rep": False},
    )
    volumes = AcdcVolumeDataset(custom_patients=maag_test_ids())
    for name in CKPTS:
        path = os.path.join(SNAP, name)
        if not os.path.exists(path):
            print(name, "MISSING")
            continue
        ck = load_checkpoint(path)
        variables = {
            "params": ck["params"],
            "batch_stats": ck["batch_stats"],
            "class_memory": ck.get("class_memory", zero_mem),
        }
        totals = np.zeros((3, 3), np.float64)
        for vol in volumes:
            pred = predictor.predict_volume(variables, vol["image"])
            for i in range(1, 4):
                totals[i - 1] += calculate_metric_percase_spacing(
                    pred == i, vol["label"] == i, (10.0, 1.0, 1.0)
                )
        avg = totals / len(volumes.volumes)
        print(name, "per-class [dice hd95 asd]:")
        print(np.round(avg, 4))
        print(name, "mean:", np.round(avg.mean(axis=0), 4), flush=True)


if __name__ == "__main__":
    main()
