"""Checkpoint manager: orbax-backed save/load with verl's cadence semantics.

Mirrors FSDPCheckpointManager(+_w_lora_extra_model)
(verl/utils/checkpoint/fsdp_checkpoint_manager.py:69-264) and the trainer-side
bookkeeping (ray_trainer.py:682-785): per-step directories, a
`latest_checkpointed_iteration.txt` marker, resume_mode auto discovery, and
max-keep pruning.  Sharded-array saving is orbax's job — the per-rank
`model_world_size_{W}_rank_{r}.pt` files of the reference collapse into one
sharding-aware checkpoint.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None

LATEST_MARKER = "latest_checkpointed_iteration.txt"


class CheckpointManager:
    def __init__(self, root: str, max_keep: Optional[int] = None):
        self.root = os.path.abspath(root)
        self.max_keep = max_keep
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer() if ocp is not None else None

    # ------------------------------------------------------------------ paths
    def step_dir(self, step: int) -> str:
        return os.path.join(self.root, f"global_step_{step}")

    def latest_step(self) -> Optional[int]:
        marker = os.path.join(self.root, LATEST_MARKER)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return int(f.read().strip())

    def _existing_steps(self):
        steps = []
        for name in os.listdir(self.root):
            if name.startswith("global_step_"):
                try:
                    steps.append(int(name.split("_")[-1]))
                except ValueError:
                    pass
        return sorted(steps)

    # -------------------------------------------------------------------- io
    def save(self, step: int, state: Any) -> str:
        """state: pytree (params, opt_state, rng, extra metadata arrays)."""
        path = self.step_dir(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(os.path.join(path, "state"), state)
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.root, LATEST_MARKER), "w") as f:
            f.write(str(step))
        self._prune()
        return path

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = os.path.join(self.step_dir(step), "state")
        return self._ckpt.restore(path, template) if template is not None else self._ckpt.restore(path)

    def _prune(self):
        if self.max_keep is None:
            return
        steps = self._existing_steps()
        for s in steps[: -self.max_keep]:
            shutil.rmtree(self.step_dir(s), ignore_errors=True)


def should_save(step: int, total_steps: int, save_freq: int, save_last_freq: int, save_last_num: int) -> bool:
    """Cadence from ray_trainer.py:1762-1769: every save_freq steps, plus a
    save-last-K window near the end."""
    is_last = step >= total_steps
    if save_freq > 0 and (is_last or step % save_freq == 0):
        return True
    remaining = total_steps - step
    return (
        save_last_freq > 0
        and remaining <= save_last_freq * save_last_num
        and remaining % save_last_freq == 0
    )
