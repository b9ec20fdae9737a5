"""Flow-matching policy actor: stochastic rollout + logp replay + PPO update math.

TPU-native counterpart of the reference's HFRollout + DataParallelPPOActor
pair (verl/workers/rollout/hf_rollout.py:57-181,
verl/workers/actor/dp_actor.py:87-532):

* `generate_actions` — ONE VLM context forward, then a `lax.scan` over the
  K=10 Euler flow steps, each sampling x_{k+1} ~ N(x_k + dt*flow, sigma) with
  the sigma net; returns `predicted_actions` and the full `x_chain`
  (B, K+1, chunk, action_dim) for logp reproduction.
* `compute_log_prob` — replays the chain (dp_actor._forward_micro_batch):
  per-dim Gaussian logp accumulated in float32, entropy =
  (sum_k log sigma_k + 0.5 log 2πe) / (K+1).
* `policy_loss_fn` — dual-clip PG + entropy bonus + adaptively gated
  flow-matching BC MSE + optional KL loss (dp_actor.update_policy:373-532).

Dtype discipline (SURVEY "hard parts"): the chain is stored in bf16; both the
rollout and the replay feed the same bf16 x_k into flow/sigma nets and compute
the Gaussian logp in f32 — rollout and replay are bit-identical by
construction.  During updates the VLM context is wrapped in stop_gradient:
only the action expert is trainable (fsdp_workers.py:435-449), so the VLM
backward pass the reference wastes is simply never built.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vla_rft_tpu.models.action_head import ActionExpert, sample_noisy_actions  # noqa: F401
from vla_rft_tpu.models.prismatic import OpenVLA
from vla_rft_tpu.trainer import core_algos

LOG_2PI = math.log(2.0 * math.pi)
CONST_ENTROPY = 0.5 * (LOG_2PI + 1.0)  # 0.5*log(2πe), dp_actor.py:115


def encode_context(vla: OpenVLA, vla_params, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """The single multimodal VLM forward shared by rollout and replay."""
    return vla.apply(
        vla_params,
        batch["input_ids"],
        batch["pixels"],
        batch["labels"],
        batch["attention_mask"],
        method=vla.encode_context,
    )


def generate_actions(
    vla: OpenVLA,
    expert: ActionExpert,
    vla_params,
    expert_params,
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    num_flow_steps: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Stochastic flow rollout (hf_rollout.py:57-181).

    batch: input_ids/pixels/labels/attention_mask/proprio/noise.
    Returns predicted_actions (B, C, A) bf16 and x_chain (B, K+1, C, A) bf16.
    """
    hidden = encode_context(vla, vla_params, batch)
    return rollout_from_hidden(
        expert, expert_params, rng, hidden, batch["noise"], batch["proprio"],
        num_flow_steps,
    )


def rollout_from_hidden(
    expert: ActionExpert,
    expert_params,
    rng: jax.Array,
    hidden: jnp.ndarray,
    noise: jnp.ndarray,
    proprio: jnp.ndarray,
    num_flow_steps: int = 10,
    deterministic: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Flow rollout given a precomputed VLM context.

    The context depends only on (input_ids, pixels, labels) — identical
    across the n GRPO rollouts and across rollout/logp/update phases — so the
    trainer encodes each unique sample ONCE per step and reuses/repeats the
    hidden states (the reference re-runs the frozen VLM in every phase).

    deterministic=True skips the sigma net and Gaussian sampling: each step
    is the plain Euler mean update, matching eval-time prediction
    (modeling_prismatic.py:951-1034).  This is the flow-policy analog of
    REMAX's greedy-baseline generation (do_sample=False in the reference's
    text path, ray_trainer.py:866-879)."""
    noise = noise.astype(jnp.bfloat16)
    K = num_flow_steps
    dt = -1.0 / K
    B = noise.shape[0]

    def step(carry, k):
        x, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((B,), k / K, jnp.float32)  # DiT gets 1-time = k/K
        flow = expert.apply(
            expert_params, hidden, x, t, proprio, method=expert.predict_flow
        )
        mean_next = x + jnp.asarray(dt, x.dtype) * flow.astype(x.dtype)
        if deterministic:
            return (mean_next.astype(jnp.bfloat16), key), mean_next.astype(
                jnp.bfloat16
            )
        std, _ = expert.apply(
            expert_params, hidden, x, t, proprio, method=expert.predict_std
        )
        # sample in f32, store bf16 (hf_rollout.py:150-152)
        eps = jax.random.normal(sub, x.shape, jnp.float32)
        x_next = (
            mean_next.astype(jnp.float32)
            + jnp.clip(std.astype(jnp.float32), 1e-6, None) * eps
        ).astype(jnp.bfloat16)
        return (x_next, key), x_next

    (x_final, _), xs = jax.lax.scan(
        step, (noise, rng), jnp.arange(K, dtype=jnp.float32)
    )
    x_chain = jnp.concatenate([noise[:, None], jnp.moveaxis(xs, 0, 1)], axis=1)
    return {"predicted_actions": x_final, "x_chain": x_chain}


def _replay_logp(
    expert: ActionExpert,
    expert_params,
    hidden: jnp.ndarray,
    x_chain: jnp.ndarray,  # (B, K+1, C, A) bf16
    proprio: jnp.ndarray,
    return_entropy: bool,
    step_chunks: int = 2,
):
    """Replay the chain (dp_actor.py:141-195) with the K flow steps BATCHED.

    The replay is teacher-forced — every step's input x_k is known up front
    — so unlike the sequential rollout it needs no scan: steps fold into
    the batch dim and the two DiTs run at K/step_chunks x the batch.  The
    reference (and the first port) scanned K sequential tiny forwards,
    which left the MXU >90% idle at head sizes.  Math is identical; the
    per-step Gaussian terms just sum over the folded axis.

    step_chunks: chunks the folded axis to bound activation memory in the
    grad path (1 = fully batched; K = the old one-step-at-a-time shape).
    """
    B, Kp1, C, A = x_chain.shape
    K = Kp1 - 1
    dt = -1.0 / K
    while K % step_chunks != 0:
        step_chunks += 1
    kc = K // step_chunks  # steps folded per call

    # (step_chunks, B*kc, ...) inputs: chunk c covers steps [c*kc, (c+1)*kc)
    x_in = jnp.moveaxis(
        x_chain[:, :K].reshape(B, step_chunks, kc, C, A), 0, 1
    ).reshape(step_chunks, B * kc, C, A)
    x_next = jnp.moveaxis(
        x_chain[:, 1:].reshape(B, step_chunks, kc, C, A), 0, 1
    ).reshape(step_chunks, B * kc, C, A)
    ks = jnp.arange(K, dtype=jnp.float32).reshape(step_chunks, kc)
    t_all = jnp.broadcast_to(ks[:, None, :] / K, (step_chunks, B, kc)).reshape(
        step_chunks, B * kc
    )

    hid_rep = jnp.repeat(hidden, kc, axis=0)  # (B*kc, S, D)
    prop_rep = jnp.repeat(proprio, kc, axis=0)

    def chunk(carry, args):
        logp_acc, ent_acc = carry
        x_k, x_k1, t = args
        flow = expert.apply(
            expert_params, hid_rep, x_k, t, prop_rep, method=expert.predict_flow
        )
        std, log_std = expert.apply(
            expert_params, hid_rep, x_k, t, prop_rep, method=expert.predict_std
        )
        mean = (x_k + jnp.asarray(dt, x_k.dtype) * flow.astype(x_k.dtype)).astype(
            jnp.float32
        )
        sd = jnp.clip(std.astype(jnp.float32), 1e-6, None)
        z = (x_k1.astype(jnp.float32) - mean) / sd
        step_logp = -0.5 * z * z - jnp.log(sd) - 0.5 * LOG_2PI
        logp_acc = logp_acc + step_logp.reshape(B, kc, C, A).sum(axis=1)
        if return_entropy:
            ent_acc = ent_acc + (
                log_std.astype(jnp.float32) + CONST_ENTROPY
            ).reshape(B, kc, C, A).sum(axis=1)
        return (logp_acc, ent_acc), None

    zeros = jnp.zeros((B, C, A), jnp.float32)
    (logp, ent), _ = jax.lax.scan(chunk, (zeros, zeros), (x_in, x_next, t_all))
    logp_vec = logp.reshape(B, C * A).astype(jnp.bfloat16)
    if return_entropy:
        ent_vec = (ent / (K + 1)).reshape(B, C * A).astype(jnp.bfloat16)
        return logp_vec, ent_vec
    return logp_vec, None


def compute_log_prob(
    vla: OpenVLA,
    expert: ActionExpert,
    vla_params,
    expert_params,
    batch: Dict[str, jnp.ndarray],
    return_entropy: bool = False,
    stop_vlm_gradient: bool = True,
):
    """dp_actor.compute_log_prob / _forward_micro_batch."""
    hidden = encode_context(vla, vla_params, batch)
    if stop_vlm_gradient:
        hidden = jax.lax.stop_gradient(hidden)
    logp, ent = _replay_logp(
        expert, expert_params, hidden, batch["x_chain"], batch["proprio"],
        return_entropy, step_chunks=1,  # no grad: fully batched
    )
    if return_entropy:
        return logp, ent, hidden
    return logp


def logp_from_hidden(
    expert: ActionExpert,
    expert_params,
    hidden: jnp.ndarray,
    x_chain: jnp.ndarray,
    proprio: jnp.ndarray,
    return_entropy: bool = False,
):
    """Chain replay given a precomputed VLM context (see rollout_from_hidden)."""
    logp, ent = _replay_logp(
        expert, expert_params, hidden, x_chain, proprio, return_entropy,
        step_chunks=1,  # no grad: fully batched
    )
    return (logp, ent) if return_entropy else logp


def policy_loss_fn(
    expert: ActionExpert,
    expert_params,
    hidden: jnp.ndarray,  # stop-gradient VLM context (B, S_ctx, D)
    batch: Dict[str, jnp.ndarray],
    cfg,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Micro-batch loss (dp_actor.update_policy:418-516).

    batch needs: x_chain, proprio, old_log_probs, advantages (B, C*A);
    optional flow/gt_noisy_actions/gt_timesteps (BC MSE), ref_log_probs (KL),
    gt_actions/predicted_actions (l1 metric).
    cfg: the actor config group (clip ratios, entropy_coeff, mse gate, ...).
    """
    new_logp, entropy = _replay_logp(
        expert, expert_params, hidden, batch["x_chain"], batch["proprio"], True,
        step_chunks=int(cfg.get("replay_step_chunks", 2) or 2),
    )
    old_logp = batch["old_log_probs"].astype(jnp.float32)
    advantages = batch["advantages"].astype(jnp.float32)
    response_mask = jnp.ones_like(advantages)
    if "mb_mask" in batch:
        # rows duplicated by the trainer to fill a short final micro-batch:
        # fully masked so every aggregation ignores them (no sample is
        # dropped, none counts twice)
        response_mask = response_mask * batch["mb_mask"].astype(jnp.float32)[:, None]
    row_w = response_mask[:, 0]  # per-sample validity (all-ones without mb_mask)
    n_valid = jnp.maximum(row_w.sum(), 1.0)

    clip_ratio = cfg.clip_ratio
    pg_loss, pg_clipfrac, ppo_kl, pg_clipfrac_lower = core_algos.compute_policy_loss(
        old_log_prob=old_logp,
        log_prob=new_logp.astype(jnp.float32),
        advantages=advantages,
        response_mask=response_mask,
        cliprange=clip_ratio,
        cliprange_low=cfg.get("clip_ratio_low", None) or clip_ratio,
        cliprange_high=cfg.get("clip_ratio_high", None) or clip_ratio,
        clip_ratio_c=cfg.get("clip_ratio_c", 3.0),
        loss_agg_mode=cfg.loss_agg_mode,
    )
    entropy_loss = core_algos.agg_loss(
        entropy.astype(jnp.float32), response_mask, cfg.loss_agg_mode
    )
    policy_loss = pg_loss - entropy_loss * cfg.entropy_coeff

    metrics = {
        "actor/entropy": entropy_loss,
        "actor/pg_loss": pg_loss,
        "actor/pg_clipfrac": pg_clipfrac,
        "actor/ppo_kl": ppo_kl,
        "actor/pg_clipfrac_lower": pg_clipfrac_lower,
    }

    if cfg.get("log_l1_loss", False) and "gt_actions" in batch:
        l1_rows = jnp.abs(
            batch["predicted_actions"].astype(jnp.float32)
            - batch["gt_actions"].astype(jnp.float32)
        ).reshape(row_w.shape[0], -1).mean(-1)
        l1 = jnp.sum(l1_rows * row_w) / n_valid
        metrics["actor/l1_loss"] = jax.lax.stop_gradient(l1)

    if cfg.get("use_mse_loss", False):
        # adaptive gate in [0,1] from ppo_kl (dp_actor.py:465-489)
        t = (jax.lax.stop_gradient(ppo_kl) - cfg.mse_kl_low) / (
            cfg.mse_kl_high - cfg.mse_kl_low
        )
        gate = jnp.clip(t, 0.0, 1.0)
        mse_coef = cfg.mse_loss_coef * gate
        flow_pred = expert.apply(
            expert_params,
            hidden,
            batch["gt_noisy_actions"],
            batch["gt_timesteps"].astype(jnp.float32),
            batch["proprio"],
            method=expert.predict_flow,
        )
        sq = (flow_pred.astype(jnp.float32) - batch["flow"].astype(jnp.float32)) ** 2
        mse = jnp.sum(sq.reshape(row_w.shape[0], -1).mean(-1) * row_w) / n_valid
        policy_loss = policy_loss + mse * mse_coef
        metrics["actor/mse_loss"] = jax.lax.stop_gradient(mse)
        metrics["actor/mse_coef"] = mse_coef

    if cfg.get("use_kl_loss", False) and "ref_log_probs" in batch:
        kld = core_algos.kl_penalty(
            new_logp.astype(jnp.float32),
            batch["ref_log_probs"].astype(jnp.float32),
            cfg.kl_loss_type,
        )
        kl_loss = core_algos.agg_loss(
            kld, jnp.ones_like(kld) * row_w[:, None], cfg.loss_agg_mode
        )
        policy_loss = policy_loss + kl_loss * cfg.kl_loss_coef
        metrics["actor/kl_loss"] = kl_loss

    return policy_loss, metrics
