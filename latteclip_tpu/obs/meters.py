"""Metrics meters + throughput accounting (reference train.py:35-51,595-600)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class DeviceMeterBank:
    """Every-step metric averages without per-step host syncs.

    The reference updates its AverageMeters from every step's losses
    (train.py:584-607); fetching device scalars every step would serialize
    the TPU pipeline, and sampling only every Nth step (round-2 behavior)
    made ``loss.avg`` an average of sampled steps. This keeps the metric
    SUMS on device — one jitted tree-add per step, dispatched async like the
    train step itself — and fetches a single time per log point, so ``avg``
    means exactly what the reference's means.
    """

    def __init__(self):
        self._sum = None
        self._last = None
        self.count = 0
        self._add = None

    def update(self, metrics) -> None:
        """Record one step's device-scalar metrics dict (no host sync)."""
        self._last = metrics
        if self._sum is None:
            self._sum = metrics
        else:
            if self._add is None:
                import jax

                self._add = jax.jit(
                    lambda a, b: jax.tree_util.tree_map(lambda x, y: x + y, a, b)
                )
            self._sum = self._add(self._sum, metrics)
        self.count += 1

    def fetch(self) -> Dict[str, "AverageMeter"]:
        """ONE host sync: {key: AverageMeter} with val = latest step's value
        and avg = mean over every step since construction."""
        import jax
        import numpy as np

        last = jax.device_get(self._last)
        total = jax.device_get(self._sum)
        out: Dict[str, AverageMeter] = {}
        for k, v in last.items():
            if np.ndim(v) != 0:
                continue
            m = AverageMeter()
            m.val = float(v)
            m.sum = float(total[k])
            m.count = self.count
            out[k] = m
        return out


class Throughput:
    """samples/s and samples/s/chip with the reference's formula
    (accum·batch·world / batch_time — train.py:595-600; accum is 1 here)."""

    def __init__(self, batch_size: int, world_size: int = 1):
        self.batch_size = batch_size
        self.world_size = world_size
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._last = time.time()

    def tick_data(self):
        self.data_time.update(time.time() - self._last)

    def tick_batch(self):
        now = time.time()
        self.batch_time.update(now - self._last)
        self._last = now

    @property
    def samples_per_second(self) -> float:
        return self.batch_size * self.world_size / max(self.batch_time.val, 1e-9)

    @property
    def samples_per_second_per_chip(self) -> float:
        return self.batch_size / max(self.batch_time.val, 1e-9)


def append_results_jsonl(path: str, record: Dict) -> None:
    """Append eval metrics to results.jsonl (reference train.py:1488-1490)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
