"""Reward pipeline: detokenize WM responses and score against real frames.

TPU-native port of the trainer-side reward functions + TokenizerWorker:
* msp_reward (ray_trainer.py:1297-1402 msp_reward_fn +
  fsdp_workers.py:1791-1839 detokenize): split WM responses into per-frame
  visual tokens, FSQ-decode with the compressive tokenizer, per-frame
  recon (mae/mse) + LPIPS, weighted sum, aggregate mean/last/discount,
  scalar reward at the last response token.
* ac_reward (ray_trainer.py:1404-1469): action-space l1/mse/huber reward.

Everything runs inside one jit — the reference round-trips pixels through Ray
to a GPU TokenizerWorker per phase.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vla_rft_tpu.models.lpips import LPIPS
from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ
from vla_rft_tpu.workers.processor import ProcessorConfig, split_response_tokens


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """trainer.reward_fn / loss_weight / msp_* (run_vla_rft.sh:12,23-25)."""

    reward_fn: str = "mae"  # mae | mse
    lpips_weight: float = 1.0
    recon_weight: float = 1.0  # loss_weight[reward_fn]
    msp_reward_aggregate: str = "mean"  # mean | last | discount
    msp_reward_discount: float = 0.95
    num_frames: int = 8


def _recon_loss(real: jnp.ndarray, pred: jnp.ndarray, kind: str) -> jnp.ndarray:
    """(B, F, H, W, C) -> (B, F) (ray_trainer.py:1332-1337)."""
    if kind == "mse":
        return jnp.mean((real - pred) ** 2, axis=(2, 3, 4))
    if kind == "mae":
        return jnp.mean(jnp.abs(real - pred), axis=(2, 3, 4))
    raise NotImplementedError(kind)


def perceptual_loss_frames(
    lpips: LPIPS, lpips_params, real: jnp.ndarray, pred: jnp.ndarray
) -> jnp.ndarray:
    """(B, F, H, W, C) in [0,1] -> (B, F). Inputs scaled to [-1,1]
    (fsdp_workers.py:1735-1737)."""
    B, F = real.shape[:2]
    r = real.reshape(B * F, *real.shape[2:]) * 2.0 - 1.0
    p = pred.reshape(B * F, *pred.shape[2:]) * 2.0 - 1.0
    out = lpips.apply(lpips_params, r, p)
    return out.reshape(B, F)


def aggregate_msp(loss: jnp.ndarray, cfg: RewardConfig) -> jnp.ndarray:
    """(B, F) per-frame loss -> (B,) (ray_trainer.py:1348-1357)."""
    if cfg.msp_reward_aggregate == "mean":
        return loss.mean(-1)
    if cfg.msp_reward_aggregate == "last":
        return loss[:, -1]
    if cfg.msp_reward_aggregate == "discount":
        F = loss.shape[1]
        w = cfg.msp_reward_discount ** jnp.arange(F - 1, -1, -1, dtype=jnp.float32)
        return (loss * w[None]).sum(-1) / w.sum()
    raise NotImplementedError(cfg.msp_reward_aggregate)


def detokenize_response_frames(
    tokenizer: CompressiveVQModelFSQ,
    tok_params,
    proc_cfg: ProcessorConfig,
    num_frames: int,
    responses: jnp.ndarray,  # (N, response_length)
    ctx_feats,  # unique ctx decoder feature pyramid [(B_u, h, w, c)]
    feat_map: jnp.ndarray,  # (N,) row -> ctx_feats index
) -> jnp.ndarray:
    """FSQ-decode a batch of WM responses to pixel frames (N, F, H, W, C)
    in [0,1].  Used to decode the unique gt-branch rollouts ONCE per step;
    the per-chunk reward then gathers rows from the result instead of
    re-decoding the gt frames in every reward micro-batch."""
    vis = split_response_tokens(proc_cfg, responses, num_frames)
    feats = [jnp.take(f, feat_map, axis=0) for f in ctx_feats]
    out = tokenizer.apply(tok_params, vis, feats, method=tokenizer.detokenize_dyn)
    return jnp.clip(out, 0.0, 1.0)


def msp_reward(
    tokenizer: CompressiveVQModelFSQ,
    tok_params,
    lpips: LPIPS,
    lpips_params,
    proc_cfg: ProcessorConfig,
    reward_cfg: RewardConfig,
    responses: jnp.ndarray,  # (B, response_length) WM rollout output
    ctx_tokens: jnp.ndarray,  # (B, 1, 1024) offset ctx tokens
    real_frames: Optional[jnp.ndarray] = None,  # (B, F, H, W, C) in [0,1]
    gt_responses: Optional[jnp.ndarray] = None,  # (B|U, response_length) gt branch
    ctx_feats=None,  # precomputed UNIQUE decoder feature pyramid [(B_u, h, w, c)]
    ctx_map: Optional[jnp.ndarray] = None,  # (B,) int32 row -> unique index
    gt_map: Optional[jnp.ndarray] = None,  # (B,) row -> gt_responses row (dedup)
    gt_feat_idx: Optional[jnp.ndarray] = None,  # (U,) gt row -> ctx_feats row
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (reward_tensor (B, response_length), metrics).

    Reward = -(recon*w + lpips*w) aggregated over frames, written at the last
    response token (ray_trainer.py:1389-1398; responses have no padding in the
    interact layout so the last valid token is the last position).

    When `ctx_feats`/`ctx_map` are given, the ctx-frame decode (the fixed
    ~20% of detokenize) is skipped: features were computed once per unique
    sample (trainer step) and are gathered per row here — both branches
    share them (the reference re-runs the full decode per branch per
    micro-batch, fsdp_workers.py:1791-1839).

    When `gt_map` is given, `gt_responses` carries only the UNIQUE gt-branch
    rollouts (one per sample, gt_branch_per_sample) and row i of the batch
    compares against decoded gt row gt_map[i] — the gt decode runs once per
    sample instead of once per rollout."""
    F = reward_cfg.num_frames
    vis = split_response_tokens(proc_cfg, responses, F)  # (B, F, 64)

    def detok(v, fmap):
        """FSQ-decode dynamics tokens. `fmap` (N,) maps each decode row to
        its ctx feature / ctx token row."""
        if ctx_feats is not None:
            feats = [jnp.take(f, fmap, axis=0) for f in ctx_feats]
            return tokenizer.apply(
                tok_params, v, feats, method=tokenizer.detokenize_dyn
            )
        ctx_raw = ctx_tokens - proc_cfg.visual_token_num  # un-offset for FSQ
        ctx_r = jnp.take(ctx_raw, fmap, axis=0)
        # [:, 1:] drops the decoded ctx frame
        return tokenizer.apply(
            tok_params, ctx_r, v, method=tokenizer.detokenize
        )[:, 1:]

    B_ = vis.shape[0]
    row_map = (
        ctx_map if ctx_map is not None else jnp.arange(B_, dtype=jnp.int32)
    )
    if gt_responses is not None:
        # one decoder call for both branches: same FLOPs, one bigger batch
        # (the conv decoder runs at higher MXU utilization; the reference
        # detokenizes each branch separately, fsdp_workers.py:1791)
        gt_vis = split_response_tokens(proc_cfg, gt_responses, F)
        gfm = gt_feat_idx if gt_feat_idx is not None else row_map
        both = jnp.clip(
            detok(
                jnp.concatenate([vis, gt_vis], axis=0),
                jnp.concatenate([row_map, gfm], axis=0),
            ),
            0.0,
            1.0,
        )
        pred, real = both[:B_], both[B_:]
        if gt_map is not None:
            real = jnp.take(real, gt_map, axis=0)
    else:
        pred = jnp.clip(detok(vis, row_map), 0.0, 1.0)
        assert real_frames is not None
        real = real_frames

    recon = _recon_loss(real, pred, reward_cfg.reward_fn)  # (B, F)
    perc = perceptual_loss_frames(lpips, lpips_params, real, pred)  # (B, F)
    loss = aggregate_msp(
        recon * reward_cfg.recon_weight + perc * reward_cfg.lpips_weight, reward_cfg
    )  # (B,)

    reward_tensor = jnp.zeros(responses.shape, jnp.float32)
    reward_tensor = reward_tensor.at[:, -1].set(-loss)
    metrics = {
        "critic/recon_loss/mean": recon.mean(),
        "critic/perceptual_loss/mean": perc.mean(),
    }
    return reward_tensor, metrics


def wm_logprob_reward(
    wm,
    wm_params,
    proc_cfg: ProcessorConfig,
    reward_cfg: RewardConfig,
    input_ids: jnp.ndarray,  # (B, prompt+response) ctx_msp layout
    prompt_length: int,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """EXTENSION (non-parity, documented): teacher-forced WM log-likelihood
    of the REAL recorded future frames, conditioned on the POLICY's action
    tokens — no decode loop, so the whole reward is ONE WM forward.

    The reference's reward decodes sampled WM rollouts back to pixels and
    scores MAE+LPIPS against the real frames (ray_trainer.py:1297-1402).
    When the sampled rollout is noise-dominated, its MAE stops ranking
    actions (round-4 wmcheck); the likelihood of the *actual outcome* under
    the WM's action-conditioned dynamics is the sampling-free analog:
    actions that better explain the recorded future score higher.

    `input_ids` must interleave the REAL dyn tokens with the policy's action
    tokens (exactly what workers/processor.ctx_msp_process emits for the
    trainer's process stage).  Rewards are per-frame mean dyn-token logprob,
    aggregated with the same msp mean/last/discount modes, written at the
    last response token like msp_reward.
    """
    from vla_rft_tpu.workers import wm_rollout as _wmr

    resp_len = input_ids.shape[1] - prompt_length
    lp = _wmr.compute_log_prob(
        wm, wm_params, input_ids, resp_len, temperature=temperature
    )  # (B, resp_len)
    F = reward_cfg.num_frames
    tpf = proc_cfg.tokens_per_frame
    per_frame = tpf + proc_cfg.action_dim
    assert resp_len == F * per_frame, (resp_len, F, per_frame)
    # (B, F, tpf+A) -> dyn positions only (action tokens are the policy's
    # own inputs, not WM predictions we want to score)
    lp_f = lp.reshape(lp.shape[0], F, per_frame)[:, :, :tpf]
    frame_ll = lp_f.mean(-1)  # (B, F)
    agg = aggregate_msp(-frame_ll, reward_cfg)  # aggregate of NEGATIVE ll
    reward_tensor = jnp.zeros(input_ids[:, prompt_length:].shape, jnp.float32)
    reward_tensor = reward_tensor.at[:, -1].set(-agg)  # = aggregated ll
    metrics = {"critic/wm_dyn_logprob/mean": frame_ll.mean()}
    return reward_tensor, metrics


def ac_reward(
    gt_actions: jnp.ndarray,  # (B, C, A)
    predicted_actions: jnp.ndarray,  # (B, C, A)
    reward_type: str = "l1",
    huber_delta: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Action-space reward (ray_trainer.py:1404-1469): element-wise negative
    loss, shape (B, C*A)."""
    B = gt_actions.shape[0]
    diff = predicted_actions.reshape(B, -1).astype(jnp.float32) - gt_actions.reshape(
        B, -1
    ).astype(jnp.float32)
    absd = jnp.abs(diff)
    if reward_type == "l1":
        loss = absd
    elif reward_type == "mse":
        loss = diff**2
    elif reward_type == "huber":
        loss = jnp.where(
            absd <= huber_delta, 0.5 * diff**2, huber_delta * (absd - 0.5 * huber_delta)
        )
    else:
        raise ValueError(reward_type)
    return -loss, {f"critic/{reward_type}_loss/mean": loss.mean()}
