"""Eval harness + prompting + predict_action tests
(reference: experiments/robot/libero/run_libero_eval.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from vla_rft_tpu.data.action_tokenizer import ActionTokenizer
from vla_rft_tpu.data.prompting import IGNORE_INDEX, build_vla_sample, pad_collate
from vla_rft_tpu.eval.libero_eval import (
    GenerateConfig,
    ScriptedEnv,
    TASK_MAX_STEPS,
    prepare_observation,
    quat2axisangle,
    run_episode,
    run_suite_eval,
)
from vla_rft_tpu.workers.predict import (
    invert_gripper_action,
    normalize_gripper_action,
    predict_action,
    unnormalize_actions,
)


class StubTokenizer:
    def encode(self, text):
        return [hash(w) % 1000 + 10 for w in text.split()][:20] + [1, 2, 3]


def test_action_tokenizer_roundtrip():
    at = ActionTokenizer()
    a = np.asarray([[-1.0, -0.5, 0.0, 0.5, 0.99, 1.0, 0.2]])
    ids = at.encode(a)
    assert (ids > at.action_token_begin_idx).all()
    assert at.action_token_begin_idx == 151386
    back = at.decode_token_ids_to_actions(ids)
    np.testing.assert_allclose(back, np.clip(a, -1, 1), atol=2.0 / 255 + 1e-6)


def test_build_vla_sample_layout():
    at = ActionTokenizer()
    actions = np.random.default_rng(0).uniform(-1, 1, (8, 7))
    s = build_vla_sample(StubTokenizer(), "Pick up the bowl", actions, at)
    ids, labels = s["input_ids"], s["labels"]
    # exactly 64 action tokens at the tail, all above the begin idx
    assert (ids[-64:] > 151386).all()
    assert (ids[:-64] <= 151386).all()
    # labels mask all but last 65 positions
    assert (labels[: -(64 + 1)] == IGNORE_INDEX).all()
    assert (labels[-64:] == ids[-64:]).all()
    # first 56 = the encoded 8x7 chunk in order
    np.testing.assert_array_equal(ids[-64:-8], at.encode(actions).reshape(-1))


def test_pad_collate():
    s1 = {"input_ids": np.arange(5), "labels": np.arange(5)}
    s2 = {"input_ids": np.arange(8), "labels": np.arange(8)}
    out = pad_collate([s1, s2], pad_token_id=0)
    assert out["input_ids"].shape == (2, 8)
    np.testing.assert_array_equal(out["attention_mask"][0], [1] * 5 + [0] * 3)
    assert (out["labels"][0, 5:] == IGNORE_INDEX).all()


def test_unnormalize_and_gripper():
    stats = {"q01": np.full(7, -2.0), "q99": np.full(7, 2.0)}
    a = unnormalize_actions(np.zeros((8, 7)), stats)
    np.testing.assert_allclose(a, 0.0, atol=1e-6)
    a = unnormalize_actions(np.ones((1, 7)), stats)
    np.testing.assert_allclose(a, 2.0, atol=1e-6)
    g = normalize_gripper_action(np.asarray([[0.0] * 6 + [0.9]]))
    assert g[0, -1] == 1.0
    assert invert_gripper_action(g)[0, -1] == -1.0


def test_quat2axisangle():
    np.testing.assert_allclose(quat2axisangle(np.array([0, 0, 0, 1.0])), 0.0)
    aa = quat2axisangle(np.array([np.sin(0.5), 0, 0, np.cos(0.5)]))
    np.testing.assert_allclose(aa, [1.0, 0, 0], atol=1e-6)


def test_scripted_env_episode_and_suite():
    cfg = GenerateConfig(num_trials_per_task=2, num_steps_wait=2, resize_size=32)
    calls = []

    def chunk_fn(obs):
        assert obs["full_image"].shape == (32, 32, 3)
        assert obs["proprio"].shape == (8,)
        calls.append(1)
        return np.zeros((8, 7))

    ok = run_episode(ScriptedEnv(succeed_at=6), chunk_fn, cfg, max_steps=20)
    assert ok
    assert len(calls) >= 1  # queue refilled at least once
    ok = run_episode(ScriptedEnv(succeed_at=None), chunk_fn, cfg, max_steps=6)
    assert not ok
    metrics = run_suite_eval(
        cfg, chunk_fn, lambda tid: (ScriptedEnv(succeed_at=6), "task", None), num_tasks=2
    )
    assert metrics["success_rate"] == 1.0
    assert TASK_MAX_STEPS["libero_10"] == 520


def test_predict_action_deterministic():
    from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig
    from vla_rft_tpu.models.action_masks import ACTION_TOKEN_BEGIN_IDX
    from vla_rft_tpu.models.prismatic import OpenVLA, OpenVLAConfig

    VCFG = OpenVLAConfig.tiny_test()
    ECFG = ActionHeadConfig(
        llm_dim=VCFG.llm.hidden_size, dit_hidden=32, dit_depth=2, dit_heads=4,
        dtype=jnp.float32,
    )
    vla, expert = OpenVLA(VCFG), ActionExpert(ECFG)
    rng = np.random.default_rng(0)
    B, S = 1, 16
    labels = np.full((B, S), -100, np.int64)
    aids = ACTION_TOKEN_BEGIN_IDX + 1 + rng.integers(0, 64, (B, VCFG.num_tokens))
    labels[:, 7 : 7 + VCFG.num_tokens] = aids
    ids = rng.integers(5, 1000, (B, S))
    ids[:, 7 : 7 + VCFG.num_tokens] = aids
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "pixels": jnp.asarray(rng.uniform(size=(B, 28, 28, 6)), jnp.float32),
        "proprio": jnp.asarray(rng.normal(size=(B, 8)), jnp.float32),
    }
    vp = vla.init(jax.random.key(0), batch["input_ids"], batch["pixels"],
                  batch["labels"], batch["attention_mask"])
    hidden = jnp.zeros((B, VCFG.num_patches + VCFG.num_tokens, VCFG.llm.hidden_size))
    ep = expert.init(jax.random.key(1), hidden, jnp.zeros((B, 8, 7)), jnp.zeros((B,)),
                     batch["proprio"])
    a1 = predict_action(vla, expert, vp, ep, jax.random.key(2), batch, 4)
    a2 = predict_action(vla, expert, vp, ep, jax.random.key(2), batch, 4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (B, 8, 7)
    assert np.isfinite(np.asarray(a1, np.float32)).all()


def test_generations_logger_and_frame_grid(tmp_path):
    from vla_rft_tpu.utils.generations_logger import (
        ValidationGenerationsLogger,
        save_frame_grid,
    )

    gl = ValidationGenerationsLogger(str(tmp_path / "gen"))
    gl.log([("p1", "r1", 0.5), ("p2", "r2", 1.0)], step=7)
    import json, os

    recs = [json.loads(l) for l in open(tmp_path / "gen" / "step_7.jsonl")]
    assert len(recs) == 2 and recs[1]["score"] == 1.0

    real = np.random.default_rng(0).uniform(size=(3, 8, 8, 3))
    pred = real * 0.5
    path = save_frame_grid(real, pred, str(tmp_path / "grid.png"), reward=-0.25)
    assert os.path.exists(path) and "reward-0.25" in path


def test_letterbox():
    from vla_rft_tpu.eval.libero_eval import letterbox_image

    img = np.ones((10, 20, 3), np.uint8) * 200
    out = letterbox_image(img, 16)
    assert out.shape == (16, 16, 3)
    # top/bottom rows come from gray padding
    assert (out[0] == 127).all() and (out[-1] == 127).all()
    assert (out[8] == 200).all()


def test_gpqa_scorer():
    from vla_rft_tpu.utils.reward_score import gpqa, default_compute_score

    assert gpqa.compute_score("reasoning... Answer: C", "C") == 1.0
    assert gpqa.compute_score("Answer: $B$", "b") == 1.0
    assert gpqa.compute_score("Answer: A", "D") == 0.0
    assert gpqa.compute_score("no choice given", "A") == 0.0
    assert default_compute_score("gpqa", "Answer: D", "D") == 1.0


def test_main_eval_offline_parquet(tmp_path):
    import pandas as pd

    from vla_rft_tpu.trainer.main_eval import evaluate_parquet, run

    df = pd.DataFrame(
        {
            "prompt": ["p1", "p2"],
            "responses": [["blah #### 42", "blah #### 41"], ["Answer: C"]],
            "data_source": ["openai/gsm8k", "gpqa"],
            "reward_model": [{"ground_truth": "42"}, {"ground_truth": "C"}],
        }
    )
    path = str(tmp_path / "gen.parquet")
    df.to_parquet(path)
    res = evaluate_parquet(path)
    assert res["test_score/openai/gsm8k/pass@1"] == 0.5
    assert res["test_score/openai/gsm8k/best@n"] == 1.0
    assert res["test_score/gpqa/pass@1"] == 1.0
    res2 = run([f"data.path={path}"])
    assert res2 == res


def test_rollout_video_gif(tmp_path):
    """save_video_dir writes a per-episode GIF (libero_utils
    save_rollout_video analog)."""
    import glob

    from vla_rft_tpu.eval.libero_eval import GenerateConfig, ScriptedEnv, run_episode

    cfg = GenerateConfig(
        num_steps_wait=2, num_open_loop_steps=4, resize_size=16,
        save_video_dir=str(tmp_path),
    )
    chunk_fn = lambda obs: np.zeros((4, 7), np.float32)
    ok = run_episode(ScriptedEnv(succeed_at=6), chunk_fn, cfg, max_steps=20)
    assert ok
    vids = glob.glob(str(tmp_path / "rollout_*success=True.gif"))
    assert len(vids) == 1
