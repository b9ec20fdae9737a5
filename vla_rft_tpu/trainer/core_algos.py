"""Core PPO/GRPO algorithms.

JAX port of verl's core_algos (train/verl/verl/trainer/ppo/core_algos.py),
bit-matching semantics:
* GRPO outcome advantage — per-uid-group z-score with the single-sample
  (mean 0, std 1) convention and optional uniform_std (:107-153);
* dual-clip PPO policy loss with asymmetric clip range + clip_ratio_c
  (:341-412), including the pre-aggregated (bs, 1) variant;
* GAE, REINFORCE++(+baseline), RLOO, ReMax estimators;
* agg_loss token-mean / seq-mean-token-sum / seq-mean-token-mean (:313-338);
* kl_penalty kl/abs/mse/low_var_kl with the reference's /7.0 scaling (:460-492).

Group bookkeeping is an int `group_ids` array (the trainer maps uid strings
to dense ids; uids repeat-interleave with rollout.n, ray_trainer.py:1608-1611)
so everything is a segment reduction — no python loops over the batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vla_rft_tpu.ops.masked import masked_mean, masked_whiten


# ----------------------------------------------------------------- KL control
class FixedKLController:
    def __init__(self, kl_coef: float):
        self.value = kl_coef

    def update(self, current_kl, n_steps):
        pass


class AdaptiveKLController:
    """https://arxiv.org/pdf/1909.08593.pdf (core_algos.py:28-43)."""

    def __init__(self, init_kl_coef: float, target_kl: float, horizon: float):
        self.value = init_kl_coef
        self.target = target_kl
        self.horizon = horizon

    def update(self, current_kl: float, n_steps: int):
        proportional_error = float(jnp.clip(current_kl / self.target - 1, -0.2, 0.2))
        self.value *= 1 + proportional_error * n_steps / self.horizon


def get_kl_controller(kl_ctrl_cfg):
    if kl_ctrl_cfg.type == "fixed":
        return FixedKLController(kl_coef=kl_ctrl_cfg.kl_coef)
    if kl_ctrl_cfg.type == "adaptive":
        assert kl_ctrl_cfg.horizon > 0
        return AdaptiveKLController(
            init_kl_coef=kl_ctrl_cfg.kl_coef,
            target_kl=kl_ctrl_cfg.target_kl,
            horizon=kl_ctrl_cfg.horizon,
        )
    raise NotImplementedError(kl_ctrl_cfg.type)


# ------------------------------------------------------------- advantage fns
def _group_stats(scores: jnp.ndarray, group_ids: jnp.ndarray, num_groups: int):
    ones = jnp.ones_like(scores)
    counts = jax.ops.segment_sum(ones, group_ids, num_groups)
    sums = jax.ops.segment_sum(scores, group_ids, num_groups)
    safe_counts = jnp.maximum(counts, 1.0)
    means = sums / safe_counts
    sq = jax.ops.segment_sum((scores - means[group_ids]) ** 2, group_ids, num_groups)
    # unbiased std (torch.std default); groups of 1 -> mean 0, std 1
    stds = jnp.sqrt(sq / jnp.maximum(counts - 1.0, 1.0))
    means = jnp.where(counts <= 1.0, 0.0, means)
    stds = jnp.where(counts <= 1.0, 1.0, stds)
    return means, stds, counts


def compute_grpo_outcome_advantage(
    token_level_rewards: jnp.ndarray,  # (B, L)
    response_mask: jnp.ndarray,  # (B, Lr) — broadcast target for the advantage
    group_ids: jnp.ndarray,  # (B,) dense group index
    num_groups: int,
    epsilon: float = 1e-6,
    uniform_std: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    scores = token_level_rewards.sum(axis=-1)
    means, stds, counts = _group_stats(scores, group_ids, num_groups)
    if uniform_std:
        # reference: mean of per-group stds (core_algos.py:146-148)
        present = counts > 0
        std = jnp.sum(jnp.where(present, stds, 0.0)) / jnp.maximum(jnp.sum(present), 1)
        norm = (scores - means[group_ids]) / (std + epsilon)
    else:
        norm = (scores - means[group_ids]) / (stds[group_ids] + epsilon)
    adv = norm[:, None] * response_mask
    return adv, adv


def compute_gae_advantage_return(
    token_level_rewards: jnp.ndarray,
    values: jnp.ndarray,
    response_mask: jnp.ndarray,
    gamma: float,
    lam: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """core_algos.py:66-103 — the reversed python loop becomes a lax.scan."""

    def step(lastgaelam, xs):
        reward, value, next_value = xs
        delta = reward + gamma * next_value - value
        lastgaelam = delta + gamma * lam * lastgaelam
        return lastgaelam, lastgaelam

    next_values = jnp.concatenate([values[:, 1:], jnp.zeros_like(values[:, :1])], axis=1)
    xs = (token_level_rewards.T[::-1], values.T[::-1], next_values.T[::-1])
    _, adv_rev = jax.lax.scan(step, jnp.zeros(values.shape[0]), xs)
    advantages = adv_rev[::-1].T
    returns = advantages + values
    advantages = masked_whiten(advantages, response_mask)
    return advantages, returns


def compute_reinforce_plus_plus_outcome_advantage(
    token_level_rewards: jnp.ndarray, response_mask: jnp.ndarray, gamma: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """core_algos.py:245-276."""

    def step(running, xs):
        reward, mask = xs
        running = reward + gamma * running
        out = running
        running = running * mask
        return running, out

    xs = (token_level_rewards.T[::-1], response_mask.T[::-1])
    _, ret_rev = jax.lax.scan(step, jnp.zeros(token_level_rewards.shape[0]), xs)
    returns = ret_rev[::-1].T
    advantages = masked_whiten(returns, response_mask) * response_mask
    return advantages, returns


def compute_reinforce_plus_plus_baseline_outcome_advantage(
    token_level_rewards: jnp.ndarray,
    response_mask: jnp.ndarray,
    group_ids: jnp.ndarray,
    num_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """core_algos.py:156-198: group-mean baseline then masked whiten."""
    scores = token_level_rewards.sum(axis=-1)
    means, _, counts = _group_stats(scores, group_ids, num_groups)
    scores = scores - means[group_ids]
    adv = scores[:, None] * response_mask
    adv = masked_whiten(adv, response_mask)
    return adv, adv


def compute_rloo_outcome_advantage(
    token_level_rewards: jnp.ndarray,
    response_mask: jnp.ndarray,
    group_ids: jnp.ndarray,
    num_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """core_algos.py:201-242 leave-one-out baseline."""
    scores = token_level_rewards.sum(axis=-1)
    means, _, counts = _group_stats(scores, group_ids, num_groups)
    n = counts[group_ids]
    scale = jnp.where(n > 1, n / (n - 1), 1.0)
    mean_term = jnp.where(n > 1, means[group_ids] * scale, 0.0)
    scores = jnp.where(n > 1, scores * scale - mean_term, scores)
    adv = scores[:, None] * response_mask
    return adv, adv


def compute_remax_outcome_advantage(
    token_level_rewards: jnp.ndarray,
    reward_baselines: jnp.ndarray,
    response_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """core_algos.py:279-305."""
    masked = token_level_rewards * response_mask
    returns = jnp.cumsum(masked[:, ::-1], axis=-1)[:, ::-1]
    advantages = returns - reward_baselines[:, None] * response_mask
    return advantages, returns


def compute_rewards(token_level_scores, old_log_prob, ref_log_prob, kl_ratio):
    return token_level_scores - (old_log_prob - ref_log_prob) * kl_ratio


# ------------------------------------------------------------------- losses
def agg_loss(loss_mat: jnp.ndarray, loss_mask: jnp.ndarray, loss_agg_mode: str):
    """core_algos.py:313-338 — with one divergence: fully-masked rows (padding
    the trainer adds to fill a short final micro-batch) drop out of the
    seq-mean denominators instead of producing 0-contributions / NaNs."""
    if loss_agg_mode == "token-mean":
        return masked_mean(loss_mat, loss_mask)
    row_tokens = jnp.sum(loss_mask, axis=-1)
    valid = (row_tokens > 0).astype(loss_mat.dtype)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    if loss_agg_mode == "seq-mean-token-sum":
        return jnp.sum(jnp.sum(loss_mat * loss_mask, axis=-1)) / n_valid
    if loss_agg_mode == "seq-mean-token-mean":
        per_seq = jnp.sum(loss_mat * loss_mask, axis=-1) / jnp.maximum(row_tokens, 1.0)
        return jnp.sum(per_seq * valid) / n_valid
    raise ValueError(f"Invalid loss_agg_mode: {loss_agg_mode}")


def compute_policy_loss(
    old_log_prob: jnp.ndarray,
    log_prob: jnp.ndarray,
    advantages: jnp.ndarray,
    response_mask: jnp.ndarray,
    cliprange: Optional[float] = None,
    cliprange_low: Optional[float] = None,
    cliprange_high: Optional[float] = None,
    clip_ratio_c: float = 3.0,
    loss_agg_mode: str = "token-mean",
    log_prob_aggregated: bool = False,
):
    """Dual-clip PPO (core_algos.py:341-412). Returns
    (pg_loss, pg_clipfrac, ppo_kl, pg_clipfrac_lower)."""
    assert clip_ratio_c > 1.0
    if cliprange_low is None:
        cliprange_low = cliprange
    if cliprange_high is None:
        cliprange_high = cliprange

    if log_prob_aggregated:
        if advantages.ndim > 1 and advantages.shape[-1] > 1:
            advantages = jnp.sum(
                advantages * response_mask, axis=-1, keepdims=True
            ) / jnp.sum(response_mask, axis=-1, keepdims=True)
        denom = jnp.sum(response_mask, axis=-1, keepdims=True)
        negative_approx_kl = (log_prob - old_log_prob) / denom
        ratio = jnp.exp(negative_approx_kl)
        ppo_kl = jnp.mean(-negative_approx_kl)
        pg_losses1 = -advantages * ratio
        pg_losses2 = -advantages * jnp.clip(ratio, 1 - cliprange_low, 1 + cliprange_high)
        clip_pg_losses1 = jnp.maximum(pg_losses1, pg_losses2)
        pg_clipfrac = jnp.mean((pg_losses2 > pg_losses1).astype(jnp.float32))
        pg_losses3 = -advantages * clip_ratio_c
        clip_pg_losses2 = jnp.minimum(pg_losses3, clip_pg_losses1)
        pg_clipfrac_lower = jnp.mean(
            ((clip_pg_losses2 > pg_losses3) & (advantages < 0)).astype(jnp.float32)
        )
        pg_losses = jnp.where(advantages < 0, clip_pg_losses2, clip_pg_losses1)
        pg_loss = jnp.mean(pg_losses)
    else:
        negative_approx_kl = log_prob - old_log_prob
        ratio = jnp.exp(negative_approx_kl)
        ppo_kl = masked_mean(-negative_approx_kl, response_mask)
        pg_losses1 = -advantages * ratio
        pg_losses2 = -advantages * jnp.clip(ratio, 1 - cliprange_low, 1 + cliprange_high)
        clip_pg_losses1 = jnp.maximum(pg_losses1, pg_losses2)
        pg_clipfrac = masked_mean((pg_losses2 > pg_losses1).astype(jnp.float32), response_mask)
        pg_losses3 = -advantages * clip_ratio_c
        clip_pg_losses2 = jnp.minimum(pg_losses3, clip_pg_losses1)
        pg_clipfrac_lower = masked_mean(
            ((clip_pg_losses2 > pg_losses3) & (advantages < 0)).astype(jnp.float32),
            response_mask,
        )
        pg_losses = jnp.where(advantages < 0, clip_pg_losses2, clip_pg_losses1)
        pg_loss = agg_loss(pg_losses, response_mask, loss_agg_mode)

    return pg_loss, pg_clipfrac, ppo_kl, pg_clipfrac_lower


def compute_value_loss(vpreds, returns, values, response_mask, cliprange_value):
    """core_algos.py:434-457."""
    vpredclipped = jnp.clip(vpreds, values - cliprange_value, values + cliprange_value)
    vf_losses1 = (vpreds - returns) ** 2
    vf_losses2 = (vpredclipped - returns) ** 2
    vf_loss = 0.5 * masked_mean(jnp.maximum(vf_losses1, vf_losses2), response_mask)
    vf_clipfrac = masked_mean((vf_losses2 > vf_losses1).astype(jnp.float32), response_mask)
    return vf_loss, vf_clipfrac


def kl_penalty(logprob: jnp.ndarray, ref_logprob: jnp.ndarray, penalty: str) -> jnp.ndarray:
    """core_algos.py:460-492."""
    if penalty == "kl":
        return logprob - ref_logprob
    if penalty == "abs":
        return jnp.abs(logprob - ref_logprob)
    if penalty == "mse":
        return 0.5 * (logprob - ref_logprob) ** 2
    if penalty == "low_var_kl":
        kl = (ref_logprob - logprob) / 7.0  # reference's scaling
        kld = jnp.exp(kl) - kl - 1
        return jnp.clip(kld, -10, 10)
    raise NotImplementedError(penalty)
