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
