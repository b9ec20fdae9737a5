"""World-model sequence processors: pixels+actions -> token sequences.

JAX ports of ivideogpt's processors (train/verl/ivideogpt/processor.py):

* ContextMultiStepPredictionProcessor ('ctx_msp', processor.py:140-225) — the
  VLA-RFT path.  Layout for the LIBERO run:
    [ctx(1024, +4375 offset)] then per future frame [dyn(64)] [act(7, +8750)]
  labels mask the ctx block and the first frame's dyn tokens
  (processor.py:201-203); total length 1024 + 9*(64+7) = 1663.
* SimpleVideoProcessor ('simple', processor.py:32-137) — per-frame path with
  BOS/EOS framing of the response.

Everything is a pure function of arrays; tokenizer encode runs inside the same
jit (the reference round-trips through a GPU "TokenizerWorker" RPC instead,
verl/workers/fsdp_workers.py:1841-1870).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.ops.masked import compute_position_id_with_mask


@dataclasses.dataclass(frozen=True)
class ProcessorConfig:
    """Mirrors the `processor:` config group (vla_rft_grpo_trainer.yaml:31-51)."""

    visual_token_num: int = 4375
    action_bins: int = 256
    action_dim: int = 7
    tokens_per_frame: int = 64
    bos_token_id: int = 9006
    eos_token_id: int = 9007
    pad_token_id: int = 9007
    context_length: int = 1
    processor_type: str = "ctx_msp"


def discretize_actions(
    actions: jnp.ndarray, action_ranges: jnp.ndarray, num_bins: int = 256
) -> jnp.ndarray:
    """Uniform-bin action discretization (processor.py:146-159).

    actions: (..., A); action_ranges: (A, 2) [min, max] -> int32 bins (..., A).
    """
    mins = action_ranges[:, 0]
    maxs = action_ranges[:, 1]
    x = jnp.clip((actions - mins) / (maxs - mins + 1e-8), 0.0, 1.0)
    return jnp.clip(jnp.floor(x * num_bins), 0, num_bins - 1).astype(jnp.int32)


def ctx_msp_process(
    cfg: ProcessorConfig,
    ctx_tokens: jnp.ndarray,  # (B, 1, 1024) raw FSQ indices (un-offset)
    dyn_tokens: jnp.ndarray,  # (B, T, 64) raw FSQ indices
    actions: jnp.ndarray,  # (B, T+1, A) continuous
    action_ranges: jnp.ndarray,  # (A, 2)
) -> Dict[str, jnp.ndarray]:
    """Build WM input sequences (ContextMultiStepPredictionProcessor.__call__,
    processor.py:172-225). Returns input_ids/attention_mask/position_ids/
    labels/action_ids plus the offset ctx_tokens."""
    B, T = dyn_tokens.shape[:2]
    v = cfg.visual_token_num

    ctx = (ctx_tokens + v).reshape(B, -1)  # offset ctx tokens (processor.py:191)
    act = discretize_actions(actions[:, 1:], action_ranges, cfg.action_bins) + 2 * v
    hist = jnp.concatenate([dyn_tokens, act], axis=-1).reshape(B, -1)  # (B, T*(64+A))

    input_ids = jnp.concatenate([ctx, hist], axis=-1)

    labels = hist
    labels = labels.at[:, : dyn_tokens.shape[-1]].set(-100)  # first frame dyn masked
    labels = jnp.concatenate([jnp.full_like(ctx, -100), labels], axis=-1)

    attention_mask = jnp.ones_like(input_ids, dtype=jnp.float32)
    position_ids = compute_position_id_with_mask(attention_mask)

    return {
        "input_ids": input_ids.astype(jnp.int32),
        "attention_mask": attention_mask,
        "position_ids": position_ids,
        "labels": labels.astype(jnp.int32),
        "action_ids": act.astype(jnp.int32),
        "ctx_tokens": (ctx_tokens + v).astype(jnp.int32),
    }


def simple_process(
    cfg: ProcessorConfig,
    pixel_tokens: jnp.ndarray,  # (B, T, h*w) raw per-frame indices
    actions: jnp.ndarray,  # (B, T, A)
    action_ranges: jnp.ndarray,
    context_length: int,
) -> Dict[str, jnp.ndarray]:
    """SimpleVideoProcessor.__call__ (processor.py:89-137): hist =
    [frame tokens + offset action tokens]*, response = (BOS + tokens)* + EOS."""
    B, T = pixel_tokens.shape[:2]
    v = cfg.visual_token_num
    hist_pix = pixel_tokens[:, :context_length]
    act = discretize_actions(actions[:, :context_length], action_ranges, cfg.action_bins) + v
    hist = jnp.concatenate([hist_pix, act], axis=-1).reshape(B, -1)

    fut = pixel_tokens[:, context_length:]
    b, t, n = fut.shape
    bos = jnp.full((b, t, 1), cfg.bos_token_id, fut.dtype)
    resp = jnp.concatenate([bos, fut], axis=2).reshape(b, -1)
    eos = jnp.full((b, 1), cfg.eos_token_id, fut.dtype)
    resp = jnp.concatenate([resp, eos], axis=1)

    input_ids = jnp.concatenate([hist, resp], axis=-1)
    labels = jnp.concatenate([jnp.full_like(hist, -100), resp], axis=-1)
    attention_mask = jnp.ones_like(input_ids, dtype=jnp.float32)
    position_ids = compute_position_id_with_mask(attention_mask)
    return {
        "input_ids": input_ids.astype(jnp.int32),
        "attention_mask": attention_mask,
        "position_ids": position_ids,
        "labels": labels.astype(jnp.int32),
    }


def add_context_frame(
    pixels: jnp.ndarray, actions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prepend frame 0 as the context frame and pad actions front/back
    (TokenizerWorker.process, fsdp_workers.py:1845-1855).

    pixels: (B, T, H, W, C); actions: (B, T-1, A) ->
    pixels (B, T+1, ...), actions (B, T+1, A).
    """
    first_frame = pixels[:, 0:1]
    pixels_w_ctx = jnp.concatenate([first_frame, pixels], axis=1)
    first_action = actions[:, 0:1]
    end_action = actions[:, -1:]
    actions_w_ctx = jnp.concatenate([first_action, actions, end_action], axis=1)
    return pixels_w_ctx, actions_w_ctx


def split_response_tokens(
    cfg: ProcessorConfig, responses: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """responses (B, F*(tokens_per_frame+action_dim)) -> visual tokens
    (B, F, tokens_per_frame), clamped to the visual-token range
    (msp_reward_fn, ray_trainer.py:1306-1311)."""
    B = responses.shape[0]
    per = cfg.tokens_per_frame + cfg.action_dim
    r = responses[:, : num_frames * per].reshape(B, num_frames, per)
    vis = r[:, :, : cfg.tokens_per_frame]
    return jnp.clip(vis, 0, cfg.visual_token_num - 1).astype(jnp.int32)
