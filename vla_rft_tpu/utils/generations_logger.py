"""ValidationGenerationsLogger + predicted-frame dumps.

Ports of verl's sample-table logger (verl/utils/tracking.py
ValidationGenerationsLogger) and the trainer's predicted-vs-real frame grids
(`plot_img`, ray_trainer.py:1206-1214): wandb/jsonl sample tables for text;
PNG grids (real | predicted | abs-diff rows) with the reward in the filename.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


class ValidationGenerationsLogger:
    def __init__(self, log_dir: str = "logs/val_generations"):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def log(self, samples: List[Sequence], step: int) -> None:
        """samples: list of (prompt, response, score) tuples."""
        path = os.path.join(self.log_dir, f"step_{step}.jsonl")
        with open(path, "w") as f:
            for s in samples:
                rec = {"prompt": str(s[0]), "response": str(s[1]), "score": float(s[2])}
                f.write(json.dumps(rec) + "\n")


def save_frame_grid(
    real: np.ndarray,  # (F, H, W, 3) in [0, 1]
    pred: np.ndarray,  # (F, H, W, 3)
    path: str,
    reward: Optional[float] = None,
) -> str:
    """plot_img parity: one image with rows [real | pred | abs diff], frames
    tiled horizontally; reward encoded in the filename."""
    real = np.clip(np.asarray(real, np.float32), 0, 1)
    pred = np.clip(np.asarray(pred, np.float32), 0, 1)
    diff = np.abs(real - pred)
    rows = [np.concatenate(list(x), axis=1) for x in (real, pred, diff)]
    grid = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    if reward is not None:
        base, ext = os.path.splitext(path)
        path = f"{base}_reward{reward:.4f}{ext or '.png'}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(grid).save(path)
    except ImportError:  # PIL not available: PNG via tensorflow, else npy
        try:
            import tensorflow as tf

            tf.io.write_file(path, tf.io.encode_png(grid))
        except ImportError:
            path = path.rsplit(".", 1)[0] + ".npy"
            np.save(path, grid)
    return path
