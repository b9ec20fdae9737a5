"""REMAX in the VLA RFT loop (EXTENSION — the reference's VLA path raises
NotImplementedError, ray_trainer.py:1733-1734; its text path implements the
greedy-baseline recipe at ray_trainer.py:866-879 + core_algos.py:279-305).

Here the baseline is the deterministic Euler rollout per unique sample,
scored through the SAME tokenize->WM->reward pipeline as one extra
interleaved row per GRPO group, then stripped before logp/update."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vla_rft_tpu.config import vla_rft_default_config
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer


def _tiny_config(tmp_path, **overrides):
    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.data.video.segment_length = 3
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.num_flow_steps = 3
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu = 2
    c.actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu = 4
    c.trainer.total_training_steps = 2
    c.trainer.default_local_dir = str(tmp_path / "ckpt")
    c.trainer.logger = []
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    c.processor.tokens_per_frame = 4
    c.data.max_prompt_length = 64 + 4 + 7
    c.data.max_response_length = 2 * (4 + 7)
    c.world_model_rollout.rollout.interact_max_tokens = 4
    c.algorithm.adv_estimator = "remax"
    for k, v in overrides.items():
        node = c
        *parents, leaf = k.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = v
    return c


def _make_trainer(tmp_path, **overrides):
    c = _tiny_config(tmp_path, **overrides)
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    return VLARFTGRPOTrainer(c, preset="tiny", mesh=mesh)


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # default: msp reward WITH the per-sample gt branch (n_wm+1 groups)
        {"world_model_rollout.rollout.w_gt_ac": False},  # real-frame msp reward
        {"trainer.use_ac_reward": True},  # action-space reward path
    ],
    ids=["msp_gt_branch", "msp_real_frames", "ac_reward"],
)
def test_remax_training_step(tmp_path, overrides):
    trainer = _make_trainer(tmp_path, **overrides)
    batch = trainer.dataset.next_batch()
    metrics = trainer.training_step(batch, jax.random.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert "critic/reward_baseline/mean" in metrics
    # advantages/update shapes stay B*n: baseline rows were stripped
    B = trainer.config.data.train_batch_size
    n = trainer.config.actor_rollout_ref.rollout.n
    assert metrics["critic/rewards/mean"] is not None
    # second step with a different key also runs (jit caches warm)
    m2 = trainer.training_step(trainer.dataset.next_batch(), jax.random.key(1))
    assert np.isfinite(float(m2["actor/pg_loss"]))


def test_remax_advantage_semantics(tmp_path):
    """advantages == (row score - group baseline) at every position of the
    dummy all-ones (B*n, chunk*dim) response mask; returns carry the score."""
    trainer = _make_trainer(tmp_path)
    B = trainer.config.data.train_batch_size
    n = trainer.config.actor_rollout_ref.rollout.n
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(B * n,)).astype(np.float32)
    baselines = rng.normal(size=(B,)).astype(np.float32)
    rewards = jnp.zeros((B * n, 5), jnp.float32).at[:, -1].set(jnp.asarray(scores))
    adv, ret = trainer._advantage_remax(rewards, jnp.repeat(jnp.asarray(baselines), n))
    adv, ret = np.asarray(adv), np.asarray(ret)
    expect = scores - np.repeat(baselines, n)
    np.testing.assert_allclose(adv[:, -1], expect, rtol=1e-5, atol=1e-5)
    # cumsum-from-right of a last-token scalar: same value at every position
    np.testing.assert_allclose(adv[:, 0], expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ret[:, 0], scores, rtol=1e-5, atol=1e-5)


def test_deterministic_rollout_is_deterministic(tmp_path):
    """The greedy baseline ignores the PRNG key and skips sigma sampling."""
    trainer = _make_trainer(tmp_path)
    # drive through the trainer's own jitted fn with real shapes
    batch = trainer.dataset.next_batch()
    batch_dev = trainer.put_batch(batch)
    enc = {
        "input_ids": batch_dev["input_ids"],
        "attention_mask": batch_dev["attention_mask"],
        "labels": batch_dev["labels"],
        "pixels": batch_dev["pixel_values"],
    }
    h = trainer._encode(trainer.params["vla"], enc)
    noise = trainer._sample_noisy(jax.random.key(7), batch_dev["actions"])["noise"]
    a1 = trainer._rollout_det(
        trainer.params["expert"], jax.random.key(0), h, noise, batch_dev["proprio"]
    )["predicted_actions"]
    a2 = trainer._rollout_det(
        trainer.params["expert"], jax.random.key(123), h, noise, batch_dev["proprio"]
    )["predicted_actions"]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
