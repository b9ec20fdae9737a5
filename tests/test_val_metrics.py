"""Validation metric families: bootstrap best/worst-of-n + majority vote.

Reference semantics: train/verl/verl/trainer/ppo/metric_utils.py:177-279
(bootstrap_metric, calc_maj_val, process_validation_metrics) and the
val-core/val-aux flattening in RayPPOTrainer._validate (ray_trainer.py:600-612).
"""
import numpy as np
import jax

from vla_rft_tpu.trainer.metric_utils import (
    bootstrap_metric,
    calc_maj_val,
    flatten_validation_metrics,
    process_validation_metrics,
)


def test_bootstrap_metric_constant_data():
    data = [{"val": 3.0}] * 8
    (mean, std), = bootstrap_metric(data, 4, [lambda arr: max(d["val"] for d in arr)])
    assert mean == 3.0 and std == 0.0


def test_bootstrap_metric_bounds_and_determinism():
    vals = [0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0]
    data = [{"val": v} for v in vals]
    fns = [
        lambda arr: max(d["val"] for d in arr),
        lambda arr: min(d["val"] for d in arr),
        lambda arr: float(np.mean([d["val"] for d in arr])),
    ]
    res1 = bootstrap_metric(data, 4, fns, seed=42)
    res2 = bootstrap_metric(data, 4, fns, seed=42)
    assert res1 == res2  # same seed -> identical resamples
    (bmax, _), (bmin, _), (bmean, _) = res1
    # best-of-4 >= mean-of-4 >= worst-of-4, all within the value range
    assert 0.0 <= bmin <= bmean <= bmax <= 1.0
    assert bmax > 0.9  # P(all four draws are 0) = (1/2)^4; mean of max ~ 0.94


def test_calc_maj_val():
    data = [
        {"pred": "a", "val": 1.0},
        {"pred": "b", "val": 0.0},
        {"pred": "a", "val": 1.0},
    ]
    assert calc_maj_val(data, "pred", "val") == 1.0
    # the majority answer's value is reported even when it scores 0
    data = [
        {"pred": "wrong", "val": 0.0},
        {"pred": "wrong", "val": 0.0},
        {"pred": "right", "val": 1.0},
    ]
    assert calc_maj_val(data, "pred", "val") == 0.0
    # tie breaks to the first-seen vote (reference dict-order max)
    data = [{"pred": "x", "val": 5.0}, {"pred": "y", "val": 7.0}]
    assert calc_maj_val(data, "pred", "val") == 5.0


def test_process_validation_metrics_grouping():
    # 2 prompts x 4 responses from one source; prompt A has 3/4 correct
    # with majority "7", prompt B all wrong with majority "1"
    sources = ["gsm8k"] * 8
    inputs = ["promptA"] * 4 + ["promptB"] * 4
    infos = {
        "score": [1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        "pred": ["7", "7", "3", "7", "1", "1", "2", "1"],
    }
    out = process_validation_metrics(sources, inputs, infos)
    m = out["gsm8k"]["score"]
    assert abs(m["mean@4"] - (0.75 + 0.0) / 2) < 1e-9  # prompt-averaged
    # ks = [2, 4]: both bootstrap levels present for best/worst/maj
    for k in (2, 4):
        for fam in ("best", "worst", "maj"):
            assert f"{fam}@{k}/mean" in m and f"{fam}@{k}/std" in m
    # prompt A's maj val is 1.0 (vote "7"), prompt B's is 0.0 -> avg 0.5
    assert abs(m["maj@4/mean"] - 0.5) < 0.1
    # best-of-4 resampled from {1,1,0,1} is ~1 for A, 0 for B
    assert m["best@4/mean"] > 0.45
    assert m["worst@4/mean"] < 0.3
    # 'pred' itself gets no stats
    assert "pred" not in out["gsm8k"]


def test_process_validation_metrics_single_response():
    # n=1: only mean@1/std@1, no bootstrap families
    out = process_validation_metrics(["s"], ["p"], {"score": [1.0], "pred": ["x"]})
    assert out["s"]["score"] == {"mean@1": 1.0, "std@1": 0.0}


def test_flatten_validation_metrics_core_aux_split():
    per_src = {
        "gsm8k": {
            "acc": {"mean@4": 0.5, "std@4": 0.1, "best@2/mean": 0.6, "best@4/mean": 0.8},
            "fmt": {"mean@4": 0.9},
        }
    }
    flat = flatten_validation_metrics(per_src)
    # core = the 'acc' variable at the largest @n only
    assert "val-core/gsm8k/acc/mean@4" in flat
    assert "val-core/gsm8k/acc/best@4/mean" in flat
    assert "val-aux/gsm8k/acc/best@2/mean" in flat  # smaller n -> aux
    assert "val-aux/gsm8k/fmt/mean@4" in flat  # non-core var -> aux


def test_ppo_trainer_validate_smoke():
    """validate() end-to-end on the toy PPO setup: produces val-core metrics
    keyed by data source with the bootstrap families at n=2."""
    import jax.numpy as jnp
    from test_ppo_text import LLM_CFG, ToyDataset, ToyTokenizer, toy_score
    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
    from vla_rft_tpu.trainer.ppo_trainer import PPOTrainer
    from vla_rft_tpu.workers.reward_manager import NaiveRewardManager

    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.data.val_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.val_kwargs.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.algorithm.adv_estimator = "grpo"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=toy_score),
    )
    out = trainer.validate()
    assert "val/test_score/mean" in out
    # toy source has no rule scorer -> all scores 0, still aggregated
    score_keys = [k for k in out if "/score/" in k]
    assert any("mean@2" in k for k in score_keys)
    assert all(np.isfinite(v) for v in out.values())
