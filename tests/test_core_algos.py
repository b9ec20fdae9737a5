"""core_algos parity tests — GRPO/RLOO/GAE vs straightforward numpy loops
reproducing verl's torch implementations (core_algos.py:66-412)."""
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.trainer import core_algos


def _np_grpo(scores, gids, eps=1e-6, uniform_std=False):
    out = np.zeros_like(scores)
    stds, means = {}, {}
    for g in set(gids):
        vals = scores[gids == g]
        if len(vals) == 1:
            means[g], stds[g] = 0.0, 1.0
        else:
            means[g], stds[g] = vals.mean(), vals.std(ddof=1)
    if uniform_std:
        u = np.mean([stds[g] for g in sorted(set(gids))])
        for i in range(len(scores)):
            out[i] = (scores[i] - means[gids[i]]) / (u + eps)
    else:
        for i in range(len(scores)):
            out[i] = (scores[i] - means[gids[i]]) / (stds[gids[i]] + eps)
    return out


def test_grpo_matches_numpy():
    rng = np.random.default_rng(0)
    B, L = 12, 5
    rewards = np.zeros((B, L), np.float32)
    rewards[:, -1] = rng.normal(size=B)
    gids = np.repeat(np.arange(3), 4)
    mask = np.ones((B, 56), np.float32)
    adv, ret = core_algos.compute_grpo_outcome_advantage(
        jnp.asarray(rewards), jnp.asarray(mask), jnp.asarray(gids), 3
    )
    expected = _np_grpo(rewards[:, -1].copy(), gids)
    np.testing.assert_allclose(np.asarray(adv)[:, 0], expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), expected[:, None] * mask, rtol=1e-5)


def test_grpo_uniform_std_and_singleton():
    rewards = np.zeros((5, 3), np.float32)
    rewards[:, -1] = [1.0, 2.0, 3.0, 4.0, 10.0]
    gids = np.asarray([0, 0, 1, 1, 2])  # group 2 is a singleton
    mask = np.ones((5, 4), np.float32)
    adv, _ = core_algos.compute_grpo_outcome_advantage(
        jnp.asarray(rewards), jnp.asarray(mask), jnp.asarray(gids), 3, uniform_std=True
    )
    expected = _np_grpo(rewards[:, -1].copy(), gids, uniform_std=True)
    np.testing.assert_allclose(np.asarray(adv)[:, 0], expected, rtol=1e-5)


def test_rloo():
    rewards = np.zeros((4, 2), np.float32)
    rewards[:, -1] = [1.0, 3.0, 5.0, 7.0]
    gids = np.asarray([0, 0, 1, 1])
    mask = np.ones((4, 3), np.float32)
    adv, _ = core_algos.compute_rloo_outcome_advantage(
        jnp.asarray(rewards), jnp.asarray(mask), jnp.asarray(gids), 2
    )
    # leave-one-out: s*n/(n-1) - mean*n/(n-1); n=2, mean(0)=2 -> 1*2-2*2=-2
    np.testing.assert_allclose(np.asarray(adv)[:, 0], [-2.0, 2.0, -2.0, 2.0], rtol=1e-5)


def test_gae_matches_loop():
    rng = np.random.default_rng(1)
    B, L = 3, 7
    r = rng.normal(size=(B, L)).astype(np.float32)
    v = rng.normal(size=(B, L)).astype(np.float32)
    m = np.ones((B, L), np.float32)
    gamma, lam = 0.9, 0.8
    adv, ret = core_algos.compute_gae_advantage_return(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(m), gamma, lam
    )
    # reference loop
    lastg = np.zeros(B)
    advs = []
    for t in reversed(range(L)):
        nv = v[:, t + 1] if t < L - 1 else 0.0
        delta = r[:, t] + gamma * nv - v[:, t]
        lastg = delta + gamma * lam * lastg
        advs.append(lastg.copy())
    expected = np.stack(advs[::-1], 1)
    np.testing.assert_allclose(np.asarray(ret), expected + v, rtol=1e-4, atol=1e-5)


def test_dual_clip_policy_loss():
    old = jnp.asarray([[0.0, 0.0]])
    new = jnp.asarray([[0.5, -0.5]])
    adv = jnp.asarray([[1.0, -2.0]])
    mask = jnp.ones((1, 2))
    pg, clipfrac, kl, clip_lower = core_algos.compute_policy_loss(
        old, new, adv, mask, cliprange=0.2, clip_ratio_c=3.0
    )
    r1, r2 = np.exp(0.5), np.exp(-0.5)
    l1 = max(-1.0 * r1, -1.0 * 1.2)  # clipped at 1.2
    l2_unclipped = max(2.0 * r2, 2.0 * 0.8)
    l2 = min(2.0 * 3.0, l2_unclipped)  # dual clip for adv<0
    np.testing.assert_allclose(float(pg), (l1 + l2) / 2, rtol=1e-5)
    np.testing.assert_allclose(float(kl), -(0.5 - 0.5) / 2, atol=1e-6)


def test_kl_penalty_low_var():
    lp = jnp.asarray([0.1, 0.2])
    ref = jnp.asarray([0.3, -0.1])
    kld = core_algos.kl_penalty(lp, ref, "low_var_kl")
    kl = (np.asarray(ref) - np.asarray(lp)) / 7.0
    expected = np.exp(kl) - kl - 1
    np.testing.assert_allclose(np.asarray(kld), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(core_algos.kl_penalty(lp, ref, "kl")), np.asarray(lp - ref)
    )


def test_agg_loss_modes():
    m = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    mask = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    assert abs(float(core_algos.agg_loss(m, mask, "token-mean")) - (1 + 3 + 4) / 3) < 1e-5
    assert abs(float(core_algos.agg_loss(m, mask, "seq-mean-token-sum")) - (1 + 7) / 2) < 1e-5
    assert (
        abs(float(core_algos.agg_loss(m, mask, "seq-mean-token-mean")) - (1 + 3.5) / 2) < 1e-5
    )
