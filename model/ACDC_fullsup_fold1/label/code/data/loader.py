"""Batch iteration over RAM-cached datasets.

Replaces the reference's torch DataLoader(shuffle=True, num_workers=8)
(/root/reference/code/train_fully_supervised_2D.py:72-75) with a zero-copy
index shuffle over the preloaded arrays. Geometric augmentation happens on
device (augment_device.py) so the host loop is a `take` per step.

Batches keep a static shape for jit: the default drops the final partial
batch of an epoch (the only behavioral difference vs. torch's
drop_last=False, and it only reorders which samples share a batch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from .acdc import AcdcSliceDataset


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch of host batches.

    The functional equivalent of the reference's DataLoader workers /
    pyutils.BatchThreader (tool/pyutils.py:74-121): batch assembly overlaps
    with device compute so the accelerator never waits on the host.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def batch_iterator(
    dataset: AcdcSliceDataset,
    batch_size: int,
    seed: int = 0,
    drop_last: bool = True,
    include_dense: bool = False,
    include_index: bool = False,
) -> Iterator[dict]:
    """Endless epoch-shuffled batches of {'image': (B,H,W), 'label': (B,H,W)}."""
    n = len(dataset)
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > dataset size {n}")
    rng = np.random.RandomState(seed)
    while True:
        perm = rng.permutation(n)
        end = n - batch_size + 1 if drop_last else n
        for start in range(0, end, batch_size):
            idx = perm[start : start + batch_size]
            if drop_last and idx.size < batch_size:
                break
            batch = {
                "image": dataset.images[idx],
                "label": dataset.labels[idx],
            }
            if include_dense:
                batch["dense_label"] = dataset.dense_labels[idx]
            if include_index:
                batch["index"] = idx
            yield batch


def paired_iterator(
    labeled: AcdcSliceDataset,
    unlabeled: AcdcSliceDataset,
    labeled_bs: int,
    unlabeled_bs: int,
    seed: int = 0,
) -> Iterator[dict]:
    """Semi-supervised batches: first `labeled_bs` samples labeled, rest not.

    Mirrors the reference mean-teacher loop's zip(cycle(labeled), unlabeled)
    construction (/root/reference/code/train_mean_teacher_2D.py:106-138):
    the epoch is keyed to the unlabeled stream and the labeled stream cycles.
    The returned batch concatenates [labeled, unlabeled] along axis 0, like
    the TwoStreamBatchSampler layout (dataset_semi.py:174-202).
    """
    lab_it = batch_iterator(labeled, labeled_bs, seed=seed)
    unlab_it = batch_iterator(unlabeled, unlabeled_bs, seed=seed + 1)
    while True:
        lb = next(lab_it)
        ub = next(unlab_it)
        yield {
            "image": np.concatenate([lb["image"], ub["image"]], axis=0),
            "label": np.concatenate([lb["label"], ub["label"]], axis=0),
            "labeled_bs": labeled_bs,
        }
