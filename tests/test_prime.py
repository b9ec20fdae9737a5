"""PRIME recipe: implicit PRM scores, DPO losses, RLOO advantages — checked
against direct numpy loop ports of recipe/prime/prime_core_algos.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.trainer import prime_core


def np_masked_rloo(reward, mask, n):
    r = reward.copy()
    r[~mask] = 0
    out = r.copy()
    B = r.shape[0]
    for g in range(0, B, n):
        means = np.array([r[i][mask[i]].mean() if mask[i].any() else 0.0 for i in range(g, g + n)])
        baseline = means.sum() / (n - 1)
        for i in range(g, g + n):
            out[i][mask[i]] = r[i][mask[i]] * (n / (n - 1)) - baseline
    return out


def test_masked_rloo_matches_loop():
    rng = np.random.default_rng(0)
    B, S, n = 8, 10, 4
    reward = rng.normal(size=(B, S)).astype(np.float32)
    mask = rng.random((B, S)) > 0.3
    mask[:, 0] = True  # no empty rows
    got = np.asarray(prime_core.masked_rloo(jnp.asarray(reward), jnp.asarray(mask), n))
    want = np_masked_rloo(reward, mask, n)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prime_advantage_shapes_and_whitening():
    rng = np.random.default_rng(1)
    B, R, n = 8, 12, 4
    mask = np.zeros((B, R), np.float32)
    for i in range(B):
        mask[i, : rng.integers(3, R)] = 1
    rm_scores = rng.normal(size=(B, R)).astype(np.float32) * mask
    acc = (rng.random(B) > 0.5).astype(np.float32)
    adv, ret = prime_core.compute_prime_advantage(
        jnp.asarray(mask), n, rm_scores=jnp.asarray(rm_scores), acc=jnp.asarray(acc)
    )
    adv, ret = np.asarray(adv), np.asarray(ret)
    assert adv.shape == (B, R) and np.isfinite(adv).all()
    # whitened over the mask: ~zero mean, unit std
    vals = adv[mask.astype(bool)]
    assert abs(vals.mean()) < 1e-3
    assert abs(vals.std() - 1.0) < 0.15
    # returns must equal the reversed cumsum of the summed RLOO rewards
    mb = mask.astype(bool)
    total = np_masked_rloo(rm_scores, mb, n)
    gt_reward = np.zeros((B, R), np.float32)
    gt_mask = np.zeros((B, R), bool)
    for i in range(B):
        last = int(mask[i].sum()) - 1
        gt_reward[i, last] = acc[i]
        gt_mask[i, last] = True
    total = total + np_masked_rloo(gt_reward, gt_mask, n)
    want = np.flip(np.cumsum(np.flip(total * mask, -1), -1), -1)
    np.testing.assert_allclose(ret, want, atol=1e-4)


def test_ce_dpo_loss_matches_manual():
    scores = jnp.asarray([[0.2, 0.3, 0.0], [-0.5, -0.1, 0.0]], jnp.float32)
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.float32)
    acc = jnp.asarray([1.0, 0.0])
    beta = 0.5
    got = float(prime_core.compute_ce_dpo_loss_rm(scores, acc, mask, beta))
    q = 1 / (1 + np.exp(-np.array([0.5, -0.6]) * beta))
    want = float(-(np.log(q[0]) + np.log(1 - q[1])) / 2)
    assert abs(got - want) < 1e-5


def np_detach_dpo(scores, acc, Q_bc, acc_bc, mask, beta, bon_mode="none"):
    cur_Q = (scores * mask).sum(1) * beta
    other = np.zeros_like(cur_Q)
    for i in range(len(cur_Q)):
        sel = Q_bc[i][acc_bc[i] < acc[i]] if acc[i] > 0 else Q_bc[i][acc_bc[i] > acc[i]]
        other[i] = sel.mean() * beta if len(sel) else 0.0
    sign = (acc > 0).astype(np.float32) * 2 - 1
    z = (cur_Q - other) * sign
    loss = -np.log(1 / (1 + np.exp(-z)))
    if bon_mode == "none":
        return loss.mean()
    n = acc_bc.shape[1]
    if bon_mode == "bon_acc":
        w = n * ((acc_bc <= acc[:, None]).mean(1)) ** (n - 1)
    else:
        w = n * ((Q_bc * beta <= cur_Q[:, None]).mean(1)) ** (n - 1)
    return (loss * w).sum()


@pytest.mark.parametrize("bon_mode", ["none", "bon_acc", "bon_rm"])
def test_detach_dpo_loss_matches_loop(bon_mode):
    rng = np.random.default_rng(2)
    B, R, n = 4, 6, 4
    scores = rng.normal(size=(B, R)).astype(np.float32)
    mask = np.ones((B, R), np.float32)
    acc = np.asarray([1.0, 0.0, 1.0, 0.0], np.float32)
    q = (scores * mask).sum(1)
    Q_bc = np.tile(q, (B, 1)).astype(np.float32)[:, :n]
    acc_bc = np.tile(acc, (B, 1)).astype(np.float32)[:, :n]
    got = float(prime_core.compute_detach_dpo_loss_rm(
        jnp.asarray(scores), jnp.asarray(acc), jnp.asarray(Q_bc),
        jnp.asarray(acc_bc), jnp.asarray(mask), 0.3, bon_mode,
    ))
    want = float(np_detach_dpo(scores, acc, Q_bc, acc_bc, mask, 0.3, bon_mode))
    assert abs(got - want) < 1e-4


def test_dpo_accuracy_perfect_and_random():
    n = 4
    mask = np.ones((4, 3), np.float32)
    acc = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    # scores aligned with acc -> accuracy 1
    aligned = jnp.asarray(np.repeat([[2.0], [-2.0], [3.0], [-1.0]], 3, axis=1), jnp.float32)
    a = float(prime_core.compute_dpo_accuracy(aligned, acc, jnp.asarray(mask), n))
    assert abs(a - 1.0) < 1e-6
    # all-equal accs -> 0.5 by convention
    a2 = float(prime_core.compute_dpo_accuracy(aligned, jnp.ones(4), jnp.asarray(mask), n))
    assert abs(a2 - 0.5) < 1e-6


def test_prime_norm():
    s = jnp.asarray([[1.0, -2.0, 3.0]], jnp.float32)
    out = np.asarray(prime_core.prime_norm(s))
    rc = np.flip(np.cumsum(np.flip(np.asarray(s), -1), -1), -1)
    np.testing.assert_allclose(out, np.asarray(s) / (np.abs(rc).max() + 1e-6), atol=1e-6)
    np.testing.assert_allclose(np.asarray(prime_core.prime_norm(s, "none")), np.asarray(s))


def test_prime_reward_worker_end_to_end():
    from vla_rft_tpu.models.transformer import TransformerConfig, Decoder
    from vla_rft_tpu.workers.prime_rm import PRIMERMConfig, PRIMERewardWorker

    llm_cfg = TransformerConfig(
        vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    R = 6
    dec = Decoder(llm_cfg)
    params = dec.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    ref = jax.tree_util.tree_map(lambda x: x + 0.01, params)
    worker = PRIMERewardWorker(
        llm_cfg, PRIMERMConfig(response_length=R, n_samples=2, beta=0.1, lr=1e-2),
        params, ref,
    )
    B, S = 4, 12
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 30, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.int32)
    pos = jnp.cumsum(am, axis=1) - 1
    scores = worker.compute_rm_score(ids, am, pos)
    s = np.asarray(scores)
    assert s.shape == (B, R) and np.isfinite(s).all()
    assert np.abs(s).max() > 0  # rm != ref -> nonzero log-ratios
    batch = {
        "input_ids": ids, "attention_mask": am, "position_ids": pos,
        "acc": jnp.asarray([1.0, 0.0, 1.0, 0.0]),
    }
    before = np.asarray(jax.tree_util.tree_leaves(worker.params)[1]).copy()
    m = worker.update_rm(batch)
    assert np.isfinite(m["prime/rm_loss"]) and 0.0 <= m["prime/dpo_acc"] <= 1.0
    after = np.asarray(jax.tree_util.tree_leaves(worker.params)[1])
    assert not np.allclose(before, after)


def test_prime_worker_whole_granularity():
    from vla_rft_tpu.models.transformer import TransformerConfig
    from vla_rft_tpu.workers.prime_rm import PRIMERMConfig, PRIMERewardWorker
    from vla_rft_tpu.models.transformer import Decoder

    llm_cfg = TransformerConfig(
        vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    dec = Decoder(llm_cfg)
    params = dec.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    worker = PRIMERewardWorker(
        llm_cfg,
        PRIMERMConfig(response_length=4, granularity="whole", norm_mode="none"),
        params, jax.tree_util.tree_map(lambda x: x * 1.01, params),
    )
    ids = jnp.asarray(np.random.default_rng(4).integers(3, 30, (2, 10)), jnp.int32)
    am = jnp.ones((2, 10), jnp.int32)
    am = am.at[1, 8:].set(0)  # row 1: only 2 valid response tokens
    pos = jnp.cumsum(am, axis=1) - 1
    s = np.asarray(worker.compute_rm_score(ids, am, pos))
    assert (s[0, :3] == 0).all() and s[0, 3] != 0
    assert s[1, 1] != 0 and (np.delete(s[1], 1) == 0).all()


def test_prime_ppo_trainer_step():
    """Full PRIME loop inside PPOTrainer: verifier acc -> implicit PRM scores
    + online RM update -> prime RLOO advantage -> PPO update
    (recipe/prime/prime_ray_trainer.py fit loop)."""
    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
    from vla_rft_tpu.trainer.ppo_trainer import PPOTrainer
    from vla_rft_tpu.workers.reward_manager import NaiveRewardManager
    from vla_rft_tpu.models.transformer import TransformerConfig

    llm_cfg = TransformerConfig(
        vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )

    class Tok:
        def decode(self, ids):
            return " ".join(map(str, ids))

    class DS:
        def sample_batch(self, b):
            ids = np.random.default_rng(0).integers(3, 30, (b, 8)).astype(np.int32)
            return {"input_ids": ids, "data_sources": ["toy"] * b, "ground_truths": ["7"] * b}

    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.algorithm.adv_estimator = "prime"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.reward_model.enable = True
    c.reward_model.rm_type = "prime"
    c.reward_model.lr = 1e-3
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, llm_cfg, Tok(), DS(), mesh=mesh,
        reward_manager=NaiveRewardManager(Tok(), compute_score=lambda s, t, g, e=None: float("7" in t.split())),
    )
    assert trainer.prime_rm is not None
    rm_before = np.asarray(jax.tree_util.tree_leaves(trainer.prime_rm.params)[1]).copy()
    m = trainer.training_step(trainer.dataset.sample_batch(2), jax.random.key(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert "prime/rm_loss" in m and "prime/dpo_acc" in m
    rm_after = np.asarray(jax.tree_util.tree_leaves(trainer.prime_rm.params)[1])
    assert not np.allclose(rm_before, rm_after)  # RM trained online
