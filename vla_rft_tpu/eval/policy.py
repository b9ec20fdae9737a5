"""Shared policy-loading glue for every robot-eval surface.

One builder returns `policy_fn(observation, task_description) -> (chunk, 7)
action array` with the policy resident on device and predict_action jitted
ONCE — the property the reference gets from a long-lived OpenVLA module
(openvla_utils.get_vla/get_vla_action :746-840).  Used by:
- eval/main_eval.py           (LIBERO, in-process)
- serving/action_server.py    (deploy.py analog: ALOHA/Bridge query it)
- eval/aloha_eval.py, eval/bridge_eval.py (in-process fallback when the
  policy host IS the robot workstation)
"""
from __future__ import annotations

import functools
import json
from typing import Any, Callable, Dict

import numpy as np


def build_policy_fn(ckpt: str = "", num_flow_steps: int = 10,
                    seed: int = 7) -> Callable[[Dict[str, Any], str], np.ndarray]:
    """Load models (converted checkpoint dir or random-init smoke), jit
    predict_action, and return the closed-over policy function.

    Observation keys used: full_image (H, W, 3 uint8; a second camera in
    'wrist_image'/'left_wrist_image' is fused into channels 3:6 when
    present, else the primary image is duplicated — matching the training
    6-channel convention), proprio/state (7,).
    """
    import jax
    import jax.numpy as jnp

    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.data.prompting import build_vla_sample, pad_collate
    from vla_rft_tpu.models.factory import build_models, init_params
    from vla_rft_tpu.workers.predict import (
        invert_gripper_action,
        normalize_gripper_action,
        predict_action,
        unnormalize_actions,
    )

    config = vla_rft_default_config()
    bundle = build_models(config, preset="libero")
    params = init_params(bundle, jax.random.key(0))
    norm_stats = {"q01": -np.ones(7), "q99": np.ones(7)}
    if ckpt:
        import os

        stats_path = os.path.join(ckpt, "dataset_statistics.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                norm_stats = json.load(f)["action"]

    jit_predict = jax.jit(
        functools.partial(predict_action, bundle.vla, bundle.expert),
        static_argnames=("num_flow_steps",),
    )

    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(ckpt) if ckpt else None
    except Exception:
        tokenizer = None
    if tokenizer is None:

        class _Stub:
            def encode(self, text):
                return [hash(w) % 1000 + 10 for w in text.split()][:20] + [1, 2, 3]

        tokenizer = _Stub()

    rng_box = [jax.random.key(seed)]

    def policy_fn(observation: Dict[str, Any], task_description: str) -> np.ndarray:
        rng_box[0], sub = jax.random.split(rng_box[0])
        s = build_vla_sample(tokenizer, task_description, None)
        coll = pad_collate([s], pad_token_id=151643, max_length=96)
        img = np.asarray(observation["full_image"], np.float32) / 255.0
        wrist = None
        for k in ("wrist_image", "left_wrist_image"):
            if k in observation:
                wrist = np.asarray(observation[k], np.float32) / 255.0
                break
        six = np.concatenate([img, wrist if wrist is not None else img], -1)
        proprio = observation.get("proprio", observation.get("state"))
        if proprio is None:
            proprio = np.zeros(7)
        proprio = np.asarray(proprio, np.float32).reshape(-1)[:7]
        batch = {
            "input_ids": jnp.asarray(coll["input_ids"], jnp.int32),
            "labels": jnp.asarray(coll["labels"], jnp.int32),
            "attention_mask": jnp.asarray(coll["attention_mask"], jnp.int32),
            "pixels": jnp.asarray(six)[None],
            "proprio": jnp.asarray(proprio)[None],
        }
        normalized = np.asarray(
            jit_predict(params["vla"], params["expert"], sub, batch,
                        num_flow_steps=num_flow_steps),
            np.float32,
        )[0]
        actions = unnormalize_actions(normalized, norm_stats)
        actions = normalize_gripper_action(actions, binarize=True)
        actions = invert_gripper_action(actions)
        return actions

    return policy_fn
