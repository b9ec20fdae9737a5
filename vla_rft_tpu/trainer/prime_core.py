"""PRIME: implicit process reward model RL (retained verl recipe).

Port of train/verl/recipe/prime/prime_core_algos.py + prime_dp_rm.py:
an LM-head reward model scores each response token as the log-ratio
between its own next-token logprob and a frozen reference's —
"implicit PRM" — trained online with a DPO-style cross-entropy against
outcome correctness, and the policy takes RLOO advantages over the
combination of process scores and ground-truth outcome rewards.

Everything is vectorized over the (group, n_samples) structure — the
reference's per-row Python loops become reshapes + masked reductions
(jit-friendly, no data-dependent shapes).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vla_rft_tpu.ops.masked import masked_whiten


def masked_rloo(reward: jnp.ndarray, mask: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Leave-one-out baseline over rollout groups (prime_core_algos.py:22-39).

    reward, mask: (B, S) with B = n_groups * n_samples (group-major order).
    Per sample i: mean m_i of its masked rewards; group baseline =
    sum(m)/n-1; output = r * n/(n-1) - baseline at masked positions.
    """
    B, S = reward.shape
    m = jnp.asarray(mask, jnp.float32)
    r = reward.astype(jnp.float32) * m
    per = r.sum(-1) / jnp.maximum(m.sum(-1), 1.0)  # (B,) per-sample mean
    group_sum = per.reshape(-1, n_samples).sum(-1, keepdims=True)  # (G, 1)
    baseline = jnp.broadcast_to(group_sum / (n_samples - 1), (B // n_samples, n_samples))
    baseline = baseline.reshape(B)
    return (r * (n_samples / (n_samples - 1)) - baseline[:, None]) * m


def compute_prime_advantage(
    response_mask: jnp.ndarray,  # (B, R) 1/0
    n_samples: int,
    rm_scores: Optional[jnp.ndarray] = None,  # (B, R) implicit-PRM token scores
    acc: Optional[jnp.ndarray] = None,  # (B,) outcome correctness
    valid_response_length: Optional[jnp.ndarray] = None,  # (B,)
    reward_dpo_coef: float = 1.0,
    reward_gt_coef: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """compute_rloo_advantage_return: RLOO each reward source, sum, reversed
    cumsum -> returns, masked whiten -> advantages."""
    m = jnp.asarray(response_mask, jnp.float32)
    B, R = m.shape
    total = jnp.zeros((B, R), jnp.float32)
    if rm_scores is not None and reward_dpo_coef != 0.0:
        total = total + reward_dpo_coef * masked_rloo(rm_scores, m, n_samples)
    if acc is not None and reward_gt_coef != 0.0:
        if valid_response_length is None:
            valid_response_length = m.sum(-1).astype(jnp.int32)
        last = jnp.maximum(valid_response_length - 1, 0)
        gt_reward = jnp.zeros((B, R), jnp.float32).at[jnp.arange(B), last].set(
            acc.astype(jnp.float32)
        )
        gt_mask = jnp.zeros((B, R), jnp.float32).at[jnp.arange(B), last].set(1.0)
        total = total + reward_gt_coef * masked_rloo(gt_reward, gt_mask, n_samples)
    returns = jnp.flip(jnp.cumsum(jnp.flip(total * m, -1), -1), -1)
    advantages = masked_whiten(returns, m)
    return advantages, returns


def compute_ce_dpo_loss_rm(
    token_level_scores: jnp.ndarray, acc: jnp.ndarray, response_mask: jnp.ndarray,
    beta: float,
) -> jnp.ndarray:
    """BCE( sigmoid(beta * sum token scores), acc ) (prime_core_algos.py:79)."""
    q = jax.nn.sigmoid((token_level_scores * response_mask).sum(-1) * beta)
    q = jnp.clip(q, 1e-7, 1 - 1e-7)
    return -(acc * jnp.log(q) + (1 - acc) * jnp.log(1 - q)).mean()


def compute_detach_dpo_loss_rm(
    token_level_scores: jnp.ndarray,  # (B, R)
    acc: jnp.ndarray,  # (B,)
    Q_bc: jnp.ndarray,  # (B, n) broadcast group Q values
    acc_bc: jnp.ndarray,  # (B, n) broadcast group accs
    response_mask: jnp.ndarray,
    beta: float,
    bon_mode: str = "none",
) -> jnp.ndarray:
    """DPO against the mean Q of opposite-outcome group members
    (prime_core_algos.py:84-116); bon_* weights reweight by best-of-n rank."""
    n = acc_bc.shape[1]
    cur_q = (token_level_scores * response_mask).sum(-1) * beta  # (B,)
    pos = acc > 0
    sel = jnp.where(pos[:, None], acc_bc < acc[:, None], acc_bc > acc[:, None])
    self32 = sel.astype(jnp.float32)
    cnt = self32.sum(-1)
    other_q = jnp.where(cnt > 0, (Q_bc * self32).sum(-1) / jnp.maximum(cnt, 1.0) * beta, 0.0)
    sign = pos.astype(jnp.float32) * 2.0 - 1.0
    dpo = -jax.nn.log_sigmoid((cur_q - other_q) * sign)
    if bon_mode == "none":
        return dpo.mean()
    if bon_mode == "bon_rm":
        frac = (Q_bc * beta <= cur_q[:, None]).astype(jnp.float32).mean(-1)
    elif bon_mode == "bon_acc":
        frac = (acc_bc <= acc[:, None]).astype(jnp.float32).mean(-1)
    else:
        raise NotImplementedError(bon_mode)
    weight = n * frac ** (n - 1)
    return (dpo * weight).sum()


def compute_dpo_accuracy(
    token_level_scores: jnp.ndarray, acc: jnp.ndarray, response_mask: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Pairwise ranking accuracy of the PRM vs outcome labels within each
    group, |acc diff|-weighted (prime_core_algos.py:118-141)."""
    scores = (token_level_scores * response_mask).sum(-1)
    G = scores.shape[0] // n_samples
    s = scores.reshape(G, n_samples)
    a = acc.reshape(G, n_samples).astype(jnp.float32)
    sd = s[:, :, None] - s[:, None, :]
    ad = a[:, :, None] - a[:, None, :]
    triu = jnp.triu(jnp.ones((n_samples, n_samples), bool), k=1)[None]
    w = jnp.abs(ad) * triu
    agree = ((sd > 0) == (ad > 0)).astype(jnp.float32)
    denom = w.sum((1, 2))
    per_group = jnp.where(denom > 0, (agree * w).sum((1, 2)) / jnp.maximum(denom, 1e-9), 0.5)
    return per_group.mean()


def prime_norm(token_level_scores: jnp.ndarray, mode: str = "batch_norm") -> jnp.ndarray:
    """Scale process scores so the largest |reverse-cumsum| is 1
    (prime_dp_rm.py:194-198)."""
    if mode != "batch_norm":
        return token_level_scores
    rc = jnp.flip(jnp.cumsum(jnp.flip(token_level_scores, -1), -1), -1)
    return token_level_scores / (jnp.abs(rc).max() + 1e-6)
