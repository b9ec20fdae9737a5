"""Eval-time action prediction: deterministic flow integration + unnormalize.

Port of OpenVLAForActionPrediction.predict_action / _run_flow_matching_
prediction_V1 (prismatic/extern/hf/modeling_prismatic.py:951-1034): ONE VLM
context forward, then K=10 deterministic Euler steps (no sigma net at eval),
then unnormalization from dataset statistics (:860-880), plus the gripper
post-processing from experiments/robot/robot_utils.py.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.action_head import ActionExpert
from vla_rft_tpu.models.prismatic import OpenVLA
from vla_rft_tpu.workers.flow_actor import encode_context


def predict_action(
    vla: OpenVLA,
    expert: ActionExpert,
    vla_params,
    expert_params,
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    num_flow_steps: int = 10,
) -> jnp.ndarray:
    """Deterministic Euler integration x += dt*flow from noise, t: 1 -> 0.

    batch: input_ids/pixels/labels/attention_mask/proprio. Returns normalized
    actions (B, chunk, action_dim) in [-1, 1]-ish space.
    """
    hidden = encode_context(vla, vla_params, batch)
    cfg = expert.cfg
    B = batch["input_ids"].shape[0]
    noise = jax.random.normal(
        rng, (B, cfg.num_actions_chunk, cfg.action_dim), jnp.float32
    ).astype(jnp.bfloat16)
    K = num_flow_steps
    dt = -1.0 / K

    def step(x, k):
        t = jnp.full((B,), k / K, jnp.float32)
        flow = expert.apply(
            expert_params, hidden, x, t, batch["proprio"], method=expert.predict_flow
        )
        return x + jnp.asarray(dt, x.dtype) * flow.astype(x.dtype), None

    x, _ = jax.lax.scan(step, noise, jnp.arange(K, dtype=jnp.float32))
    return x


def unnormalize_actions(
    normalized_actions: np.ndarray,
    norm_stats: Dict[str, np.ndarray],
    normalization_type: str = "bounds_q99",
) -> np.ndarray:
    """modeling_prismatic._unnormalize_actions (:860-880)."""
    if normalization_type == "bounds":
        high, low = np.asarray(norm_stats["max"]), np.asarray(norm_stats["min"])
        mask = np.asarray(norm_stats.get("mask", np.ones_like(low, bool)), bool)
    elif normalization_type == "bounds_q99":
        high, low = np.asarray(norm_stats["q99"]), np.asarray(norm_stats["q01"])
        mask = np.asarray(norm_stats.get("mask", np.ones_like(low, bool)), bool)
    else:
        raise ValueError(f"Unsupported normalization: {normalization_type}")
    return np.where(
        mask,
        0.5 * (normalized_actions + 1) * (high - low + 1e-8) + low,
        normalized_actions,
    )


def normalize_gripper_action(action: np.ndarray, binarize: bool = True) -> np.ndarray:
    """robot_utils.normalize_gripper_action: [0,1] -> [-1,+1], optional sign."""
    action = np.asarray(action).copy()
    action[..., -1] = 2 * (action[..., -1] - 0.0) / (1.0 - 0.0) - 1
    if binarize:
        action[..., -1] = np.sign(action[..., -1])
    return action


def invert_gripper_action(action: np.ndarray) -> np.ndarray:
    """robot_utils.invert_gripper_action: LIBERO uses -1 = open, +1 = close."""
    action = np.asarray(action).copy()
    action[..., -1] = action[..., -1] * -1.0
    return action
