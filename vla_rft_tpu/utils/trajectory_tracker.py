"""TrajectoryTracker: dump named arrays for offline diffing.

Port of verl/utils/debug/trajectory_tracker.py:50-110 (which ships tensors to
HDFS): here named arrays are written as .npz bundles per step under a local
directory (or any fsspec-able path later), with a small manifest for lookup.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class TrajectoryTracker:
    def __init__(self, root: str, enabled: bool = True):
        self.root = root
        self.enabled = enabled
        if enabled:
            os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.jsonl")

    def dump(self, name: str, step: int, tree: Dict[str, Any]) -> Optional[str]:
        """Save a dict of arrays as {root}/{name}_step{step}.npz."""
        if not self.enabled:
            return None
        arrays = {k: np.asarray(v) for k, v in tree.items()}
        path = os.path.join(self.root, f"{name}_step{step}.npz")
        np.savez_compressed(path, **arrays)
        with open(self._manifest_path, "a") as f:
            f.write(
                json.dumps(
                    {"name": name, "step": step, "path": path, "ts": time.time(),
                     "keys": sorted(arrays)}
                )
                + "\n"
            )
        return path

    def load(self, name: str, step: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.root, f"{name}_step{step}.npz")
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    def diff(self, name: str, step: int, tree: Dict[str, Any], atol: float = 1e-5):
        """Compare live arrays against a dumped trajectory; returns max abs
        diff per key (the offline-diffing workflow of the reference)."""
        ref = self.load(name, step)
        out = {}
        for k, v in tree.items():
            if k in ref:
                out[k] = float(np.abs(np.asarray(v, np.float32) - ref[k].astype(np.float32)).max())
        return out
