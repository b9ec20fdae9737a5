"""Per-phase wall-clock timers.

Mirrors the reference's codetiming `_timer` context manager and `timing_s/*`
metric family (train/verl/verl/trainer/ppo/ray_trainer.py:240-244,
metric_utils.py:140-161).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def timer(name: str, timing: Dict[str, float]):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timing[name] = timing.get(name, 0.0) + (time.perf_counter() - t0)


def timing_metrics(timing: Dict[str, float]) -> Dict[str, float]:
    return {f"timing_s/{k}": v for k, v in timing.items()}
