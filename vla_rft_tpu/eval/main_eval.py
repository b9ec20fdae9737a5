"""LIBERO eval CLI — counterpart of run_libero_eval.py's draccus main.

Loads the policy (converted checkpoint or random for smoke tests), jits
predict_action once, and drives the LIBERO suites from host CPU.
"""
from __future__ import annotations

import argparse
import functools
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task_suite_name", default="libero_spatial")
    p.add_argument("--num_trials_per_task", type=int, default=50)
    p.add_argument("--num_open_loop_steps", type=int, default=8)
    p.add_argument("--ckpt", default="")
    p.add_argument("--num_tasks", type=int, default=10)
    p.add_argument("--scripted_env", action="store_true", help="fake env smoke test")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vla_rft_tpu.data.action_tokenizer import ActionTokenizer
    from vla_rft_tpu.data.prompting import build_vla_sample, pad_collate
    from vla_rft_tpu.eval.libero_eval import (
        GenerateConfig,
        ScriptedEnv,
        make_libero_env,
        run_suite_eval,
    )
    from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig
    from vla_rft_tpu.models.factory import build_models, init_params
    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.workers.predict import (
        invert_gripper_action,
        normalize_gripper_action,
        predict_action,
        unnormalize_actions,
    )

    cfg = GenerateConfig(
        task_suite_name=args.task_suite_name,
        num_trials_per_task=args.num_trials_per_task,
        num_open_loop_steps=args.num_open_loop_steps,
    )
    config = vla_rft_default_config()
    bundle = build_models(config, preset="libero")
    params = init_params(bundle, jax.random.key(0))
    norm_stats = {"q01": -np.ones(7), "q99": np.ones(7)}
    if args.ckpt:
        # converted checkpoint loading (tools/convert_weights.py); dataset
        # statistics ride along as JSON (reference: _load_dataset_stats)
        import os

        stats_path = os.path.join(args.ckpt, "dataset_statistics.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                norm_stats = json.load(f)["action"]

    jit_predict = jax.jit(
        functools.partial(predict_action, bundle.vla, bundle.expert),
        static_argnames=("num_flow_steps",),
    )

    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.ckpt) if args.ckpt else None
    except Exception:
        tokenizer = None
    if tokenizer is None:

        class _Stub:
            def encode(self, text):
                return [hash(w) % 1000 + 10 for w in text.split()][:20] + [1, 2, 3]

        tokenizer = _Stub()

    rng = jax.random.key(cfg.seed)

    def get_action_chunk(observation, task_description="do the task"):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        s = build_vla_sample(tokenizer, task_description, None)
        coll = pad_collate([s], pad_token_id=151643, max_length=96)
        img = observation["full_image"].astype(np.float32) / 255.0
        batch = {
            "input_ids": jnp.asarray(coll["input_ids"], jnp.int32),
            "labels": jnp.asarray(coll["labels"], jnp.int32),
            "attention_mask": jnp.asarray(coll["attention_mask"], jnp.int32),
            "pixels": jnp.asarray(np.concatenate([img, img], -1))[None],
            "proprio": jnp.asarray(observation["proprio"], jnp.float32)[None],
        }
        normalized = np.asarray(
            jit_predict(params["vla"], params["expert"], sub, batch, num_flow_steps=10),
            np.float32,
        )[0]
        actions = unnormalize_actions(normalized, norm_stats)
        actions = normalize_gripper_action(actions, binarize=True)
        actions = invert_gripper_action(actions)
        return actions

    if args.scripted_env:
        env_factory = lambda tid: (ScriptedEnv(succeed_at=12), "scripted", None)
        num_tasks = 1
        cfg.num_trials_per_task = 1
        cfg.num_steps_wait = 2
    else:
        env_factory = lambda tid: make_libero_env(args.task_suite_name, tid)
        num_tasks = args.num_tasks

    metrics = run_suite_eval(cfg, get_action_chunk, env_factory, num_tasks)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
