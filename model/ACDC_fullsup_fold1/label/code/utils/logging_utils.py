"""Run logging/observability helpers (reference parity: log.txt + stdout tee,
TensorBoard scalar tags, per-run snapshot dir; SURVEY §5.5)."""

from __future__ import annotations

import logging
import os
import sys
import time


def setup_run_logging(snapshot_path: str) -> None:
    """File+stdout logging like train_fully_supervised_2D.py:203-205."""
    os.makedirs(snapshot_path, exist_ok=True)
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        filename=os.path.join(snapshot_path, "log.txt"),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
    )
    root.addHandler(logging.StreamHandler(sys.stdout))


class AverageMeter:
    """Keyed running averages (tool/pyutils.py:20-45 equivalent)."""

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def add(self, **kv):
        for k, v in kv.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
            self.counts[k] = self.counts.get(k, 0) + 1

    def get(self, key: str) -> float:
        return self.sums[key] / max(self.counts[key], 1)

    def pop(self, key: str) -> float:
        v = self.get(key)
        self.sums.pop(key, None)
        self.counts.pop(key, None)
        return v


class Timer:
    """Step timing / ETA (tool/pyutils.py:48-71 equivalent)."""

    def __init__(self, total: int | None = None):
        self.start = time.perf_counter()
        self.total = total
        self.last = self.start

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt

    def eta(self, done: int) -> float:
        if not self.total or done == 0:
            return float("nan")
        elapsed = time.perf_counter() - self.start
        return elapsed / done * (self.total - done)
