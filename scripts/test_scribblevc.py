#!/usr/bin/env python
"""Offline ScribbleVC test on Prostate folds (reference: code/test_scribblevc.py).

The reference's Prostate network module (`network.scribbleVC_Prostate`) is
absent from the snapshot (SURVEY §0.3); as in training
(engine/methods/scribblevc.py), the ScribbleVC ACDC architecture with
``num_classes=3`` stands in. Decision rule: argmax of the mean softmax of
the two heads (test_scribblevc.py:73-76); fold test ids are the 20-patient
blocks of the 80-patient Prostate split (test_scribblevc.py:42-52).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.acdc import AcdcVolumeDataset, prostate_fold_ids
from wsl4mis_tpu.eval.infer import InferenceConfig, _case_spacing
from wsl4mis_tpu.eval.metrics import calculate_metric_percase_spacing
from wsl4mis_tpu.eval.val2d import VolumePredictor
from wsl4mis_tpu.models.scribblevc import ScribbleVC
from wsl4mis_tpu.utils.checkpoint import load_checkpoint

parser = argparse.ArgumentParser()
parser.add_argument("--root_path", type=str, default="../data/Prostate")
parser.add_argument("--exp", type=str, default="Prostate_ScribbleVC")
parser.add_argument("--fold", type=str, default="prostate_fold1")
parser.add_argument("--sup_type", type=str, default="scribble")
parser.add_argument("--num_classes", type=int, default=3)
parser.add_argument("--snapshot_root", type=str, default="model")
parser.add_argument("--checkpoint", type=str, default="scribblevc_best_model.pth")
parser.add_argument("--raw_data_path", type=str, default=None)
parser.add_argument("--compute_dtype", type=str, default="bfloat16")
parser.add_argument("--data_limit", type=int, default=None)


def mean_softmax_decision(outputs):
    p1 = jax.nn.softmax(outputs[0], axis=-1)
    p2 = jax.nn.softmax(outputs[1], axis=-1)
    return jnp.argmax(0.5 * (p1 + p2), axis=-1)


if __name__ == "__main__":
    FLAGS = parser.parse_args()
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        FLAGS.compute_dtype
    ]
    model = ScribbleVC(num_classes=FLAGS.num_classes, dtype=dtype)
    snapshot = os.path.join(
        FLAGS.snapshot_root, f"{FLAGS.exp}_{FLAGS.fold}", FLAGS.sup_type
    )
    restored = load_checkpoint(os.path.join(snapshot, FLAGS.checkpoint))
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
    if "class_memory" in restored:
        variables["class_memory"] = restored["class_memory"]
    else:
        # older inference checkpoints predate the class-memory payload;
        # the no-rep test path (reference default ep=0) never reads it,
        # but the collection must exist for flax to trace the module
        init = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, 256, 256, 1), jnp.float32), train=False,
        )
        variables["class_memory"] = jax.tree.map(
            jnp.zeros_like, init["class_memory"]
        )
    predictor = VolumePredictor(
        model, (256, 256), decision_fn=mean_softmax_decision,
        apply_kwargs={"use_class_rep": False},
    )
    _, test_ids = prostate_fold_ids(FLAGS.fold)
    volumes = AcdcVolumeDataset(
        base_dir=FLAGS.root_path,
        custom_patients=test_ids,
        volumes_dirname="Prostate_training_volumes",
        limit=FLAGS.data_limit,
    )
    icfg = InferenceConfig(
        root_path=FLAGS.root_path, raw_data_path=FLAGS.raw_data_path
    )
    totals = np.zeros((FLAGS.num_classes - 1, 3), np.float64)
    for vol in volumes:
        pred = predictor.predict_volume(variables, vol["image"])
        spacing = _case_spacing(icfg, vol["case"])
        for i in range(1, FLAGS.num_classes):
            totals[i - 1] += calculate_metric_percase_spacing(
                pred == i, vol["label"] == i, spacing
            )
    avg = totals / len(volumes)
    print(avg)
    print(avg.mean(axis=0))
