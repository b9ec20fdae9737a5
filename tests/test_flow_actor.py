"""Flow actor tests: rollout/replay logp consistency, gradient routing,
policy loss. Closes the reference's missing VLA-RFT test coverage
(SURVEY §4: logp-replay vs rollout consistency)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.config import Config
from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig, sample_noisy_actions
from vla_rft_tpu.models.action_masks import ACTION_TOKEN_BEGIN_IDX
from vla_rft_tpu.models.prismatic import OpenVLA, OpenVLAConfig
from vla_rft_tpu.workers import flow_actor

B, S, CHUNK, A = 2, 16, 8, 7
VCFG = OpenVLAConfig.tiny_test()
ECFG = ActionHeadConfig(
    llm_dim=VCFG.llm.hidden_size, dit_hidden=32, dit_depth=2, dit_heads=4,
    dtype=jnp.float32,
)


def _batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    labels = np.full((B, S), -100, np.int64)
    action_ids = ACTION_TOKEN_BEGIN_IDX + 1 + rng.integers(0, 64, (B, VCFG.num_tokens))
    labels[:, 7 : 7 + VCFG.num_tokens] = action_ids
    input_ids = rng.integers(5, 1000, (B, S))
    input_ids[:, 7 : 7 + VCFG.num_tokens] = action_ids
    return {
        "input_ids": jnp.asarray(input_ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "pixels": jnp.asarray(rng.uniform(size=(B, 28, 28, 6)), jnp.float32),
        "proprio": jnp.asarray(rng.normal(size=(B, 8)), jnp.float32),
        "noise": jnp.asarray(rng.normal(size=(B, CHUNK, A)), jnp.float32),
    }


def _init():
    vla = OpenVLA(VCFG)
    expert = ActionExpert(ECFG)
    b = _batch()
    vla_params = vla.init(
        jax.random.key(0), b["input_ids"], b["pixels"], b["labels"], b["attention_mask"]
    )
    hidden = jnp.zeros((B, VCFG.num_patches + VCFG.num_tokens, VCFG.llm.hidden_size))
    expert_params = expert.init(
        jax.random.key(1), hidden, b["noise"], jnp.zeros((B,)), b["proprio"]
    )
    return vla, expert, vla_params, expert_params, b


def test_encode_context_shape():
    vla, expert, vp, ep, b = _init()
    hidden = flow_actor.encode_context(vla, vp, b)
    assert hidden.shape == (B, VCFG.num_patches + VCFG.num_tokens, VCFG.llm.hidden_size)


def test_expert_outputs():
    vla, expert, vp, ep, b = _init()
    hidden = flow_actor.encode_context(vla, vp, b)
    flow = expert.apply(ep, hidden, b["noise"], jnp.zeros((B,)), b["proprio"],
                        method=expert.predict_flow)
    std, log_std = expert.apply(ep, hidden, b["noise"], jnp.zeros((B,)), b["proprio"],
                                method=expert.predict_std)
    assert flow.shape == (B, CHUNK, A)
    assert std.shape == (B, CHUNK, A)
    assert float(std.min()) >= ECFG.min_std - 1e-5
    assert float(std.max()) <= ECFG.max_std + 1e-5
    np.testing.assert_allclose(np.asarray(jnp.exp(log_std)), np.asarray(std), rtol=1e-5)


def test_rollout_deterministic_and_chain():
    vla, expert, vp, ep, b = _init()
    out1 = flow_actor.generate_actions(vla, expert, vp, ep, jax.random.key(7), b, 4)
    out2 = flow_actor.generate_actions(vla, expert, vp, ep, jax.random.key(7), b, 4)
    np.testing.assert_array_equal(
        np.asarray(out1["x_chain"]), np.asarray(out2["x_chain"])
    )
    assert out1["x_chain"].shape == (B, 5, CHUNK, A)
    np.testing.assert_array_equal(
        np.asarray(out1["x_chain"][:, -1]), np.asarray(out1["predicted_actions"])
    )
    np.testing.assert_array_equal(
        np.asarray(out1["x_chain"][:, 0]), np.asarray(b["noise"].astype(jnp.bfloat16))
    )


def test_replay_matches_manual_loop():
    """scan-based replay == independent python-loop computation."""
    vla, expert, vp, ep, b = _init()
    K = 4
    out = flow_actor.generate_actions(vla, expert, vp, ep, jax.random.key(3), b, K)
    batch = dict(b)
    batch["x_chain"] = out["x_chain"]
    logp, ent, hidden = flow_actor.compute_log_prob(
        vla, expert, vp, ep, batch, return_entropy=True
    )
    assert logp.shape == (B, CHUNK * A)

    # manual replay, independent code path
    hid = flow_actor.encode_context(vla, vp, b)
    acc = np.zeros((B, CHUNK, A), np.float64)
    for k in range(K):
        x_k = out["x_chain"][:, k]
        x_k1 = out["x_chain"][:, k + 1].astype(jnp.float32)
        t = jnp.full((B,), k / K, jnp.float32)
        flow = expert.apply(ep, hid, x_k, t, b["proprio"], method=expert.predict_flow)
        std, _ = expert.apply(ep, hid, x_k, t, b["proprio"], method=expert.predict_std)
        mean = (x_k + jnp.asarray(-1.0 / K, x_k.dtype) * flow.astype(x_k.dtype)).astype(jnp.float32)
        sd = np.clip(np.asarray(std, np.float64), 1e-6, None)
        z = (np.asarray(x_k1, np.float64) - np.asarray(mean, np.float64)) / sd
        acc += -0.5 * z**2 - np.log(sd) - 0.5 * math.log(2 * math.pi)
    np.testing.assert_allclose(
        np.asarray(logp, np.float64), acc.reshape(B, -1), rtol=2e-2, atol=2e-2
    )  # bf16 output tolerance


def test_grad_flows_to_expert_not_vlm():
    vla, expert, vp, ep, b = _init()
    out = flow_actor.generate_actions(vla, expert, vp, ep, jax.random.key(3), b, 3)
    batch = dict(b)
    batch["x_chain"] = out["x_chain"]

    def loss(ep_, vp_):
        lp = flow_actor.compute_log_prob(vla, expert, vp_, ep_, batch)
        return jnp.sum(lp.astype(jnp.float32))

    g_ep, g_vp = jax.grad(loss, argnums=(0, 1))(ep, vp)
    ep_norm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g_ep))
    vp_norm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g_vp))
    assert ep_norm > 0
    assert vp_norm == 0  # stop_gradient on the frozen VLM context


def test_policy_loss_runs():
    vla, expert, vp, ep, b = _init()
    out = flow_actor.generate_actions(vla, expert, vp, ep, jax.random.key(3), b, 3)
    batch = dict(b)
    batch["x_chain"] = out["x_chain"]
    old_logp = flow_actor.compute_log_prob(vla, expert, vp, ep, batch)
    batch["old_log_probs"] = old_logp
    batch["advantages"] = jnp.ones((B, CHUNK * A), jnp.float32)
    noise_d = sample_noisy_actions(jax.random.key(5), jnp.zeros((B, CHUNK, A)), ECFG)
    batch.update(noise_d)
    batch["predicted_actions"] = out["predicted_actions"]
    batch["gt_actions"] = jnp.zeros((B, CHUNK, A))

    cfg = Config(
        dict(
            clip_ratio=0.2, clip_ratio_low=0.2, clip_ratio_high=0.2, clip_ratio_c=3.0,
            loss_agg_mode="token-mean", entropy_coeff=0.003, use_mse_loss=True,
            mse_loss_coef=0.01, mse_kl_low=0.0, mse_kl_high=0.2, use_kl_loss=False,
            log_l1_loss=True,
        )
    )
    hidden = jax.lax.stop_gradient(flow_actor.encode_context(vla, vp, batch))
    loss, metrics = flow_actor.policy_loss_fn(expert, ep, hidden, batch, cfg)
    assert np.isfinite(float(loss))
    # ratio == 1 on-policy -> pg_loss == -mean(adv) == -1
    np.testing.assert_allclose(float(metrics["actor/pg_loss"]), -1.0, atol=2e-2)
    np.testing.assert_allclose(float(metrics["actor/ppo_kl"]), 0.0, atol=2e-2)
    assert "actor/mse_loss" in metrics and "actor/l1_loss" in metrics
    # grads exist and are finite
    g = jax.grad(
        lambda p: flow_actor.policy_loss_fn(expert, p, hidden, batch, cfg)[0]
    )(ep)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_sample_noisy_actions_semantics():
    gt = jnp.ones((4, CHUNK, A)) * 0.5
    d = sample_noisy_actions(jax.random.key(0), gt, ECFG)
    t = np.asarray(d["gt_timesteps"], np.float32)[:, None, None]
    noise = np.asarray(d["noise"], np.float32)
    x_t = np.asarray(d["gt_noisy_actions"], np.float32)
    np.testing.assert_allclose(x_t, (1 - t) * noise + t * 0.5, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(d["flow"], np.float32), noise - 0.5, atol=1e-2
    )
    assert (t > 0).all() and (t <= 1.0).all()
