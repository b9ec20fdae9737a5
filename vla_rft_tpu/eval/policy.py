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


def assemble_pixels(observation: Dict[str, Any], num_images: int = 1,
                    center_crop: bool = False) -> np.ndarray:
    """Observation -> (H, W, 6*num_images) float32 [0,1] policy pixels.

    View order matches the reference: full_image first, then every obs key
    containing 'wrist' in dict order (openvla_utils.get_vla_action:777-779);
    each view center-cropped when asked (prepare_images_for_vla :713-744)
    then stacked [view, view] into its 6-channel dino|siglip slot
    (pixel_values concat on channels, :808-813)."""
    from vla_rft_tpu.eval.libero_eval import center_crop_image

    views = [observation["full_image"]]
    if num_images > 1:
        views += [observation[k] for k in observation if "wrist" in k]
    views = views[:num_images]
    while len(views) < num_images:  # missing cameras: repeat the last
        views.append(views[-1])
    stacks = []
    for v in views:
        if center_crop:
            v = center_crop_image(np.asarray(v))
        v = np.asarray(v, np.float32) / 255.0
        # one camera -> a 6-channel dino|siglip stack (both towers see the
        # SAME image; normalization happens inside the backbone)
        stacks.append(np.concatenate([v, v], -1))
    return np.concatenate(stacks, -1)


def build_policy_fn(ckpt: str = "", num_flow_steps: int = 10,
                    seed: int = 7, num_images: int = 1,
                    center_crop: bool = False, preset: str = "libero",
                    ) -> Callable[[Dict[str, Any], str], np.ndarray]:
    """Load models (converted checkpoint dir or random-init smoke), jit
    predict_action, and return the closed-over policy function.

    Observation keys used: full_image (H, W, 3 uint8), proprio/state (7,),
    and — when num_images > 1 — every key containing 'wrist' as an extra
    camera view (openvla_utils.get_vla_action:777-779).  Each view becomes
    its own 6-channel dino|siglip stack; views concatenate on channels to
    (H, W, 6*num_images), matching the reference's per-image pixel_values
    concat (:808-813) and the backbone's multi-image split
    (modeling_prismatic.py:209-231).  center_crop applies the reference's
    eval-time 0.9-area center crop to every view BEFORE the policy forward
    (prepare_images_for_vla, openvla_utils.py:713-744) — required when the
    checkpoint was trained with random-crop aug (run_libero_eval.py:140).
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
    config.actor_rollout_ref.model.num_images_in_input = int(num_images)
    # preset != 'libero' (tiny/push) keeps the identical glue but at
    # CPU-compilable model sizes — smoke drives and the push-env suite
    bundle = build_models(config, preset=preset)
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

    P = bundle.policy_image_size

    def _fit_views(six: np.ndarray) -> np.ndarray:
        """Per-view bilinear resize to the bundle's policy resolution (the
        harness serves cfg.resize_size images; non-libero presets are
        smaller)."""
        if six.shape[0] == P and six.shape[1] == P:
            return six
        import jax.image

        return np.asarray(
            jax.image.resize(jnp.asarray(six), (P, P, six.shape[-1]), "bilinear")
        )

    def policy_fn(observation: Dict[str, Any], task_description: str) -> np.ndarray:
        rng_box[0], sub = jax.random.split(rng_box[0])
        s = build_vla_sample(
            tokenizer, task_description, None, num_tokens=bundle.vla_cfg.num_tokens
        )
        coll = pad_collate(
            [s], pad_token_id=151643,
            max_length=max(bundle.policy_seq_len, len(s["input_ids"])),
        )
        six = _fit_views(assemble_pixels(observation, num_images, center_crop))
        proprio = observation.get("proprio", observation.get("state"))
        if proprio is None:
            proprio = np.zeros(bundle.vla_cfg.proprio_dim)
        # LIBERO proprio is 8-dim: eef_pos(3) + axis-angle(3) + gripper(2)
        # (prismatic/vla/constants.py PROPRIO_DIM); pad/trim to the
        # projector's input width rather than silently truncating
        pd = bundle.vla_cfg.proprio_dim
        proprio = np.asarray(proprio, np.float32).reshape(-1)[:pd]
        if proprio.shape[0] < pd:
            proprio = np.pad(proprio, (0, pd - proprio.shape[0]))
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
