"""Model-based reward model (sequence classifier).

Port of RewardModelWorker (verl/workers/fsdp_workers.py:1417-1700): a
decoder trunk with a scalar head scored at the last valid token of each
sequence; token-level expansion places the scalar at that position.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig


class SequenceRewardModel(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, positions=None, kv_lens=None, kv_starts=None):
        _, hidden, _ = Decoder(self.cfg, name="backbone")(
            input_ids, positions=positions, kv_lens=kv_lens, kv_starts=kv_starts,
            compute_logits=False,
        )
        scores = nn.Dense(
            1, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
            name="score_head",
        )(hidden.astype(jnp.float32))[..., 0]
        return scores  # (B, S) per-position scores


def compute_rm_score(
    rm: SequenceRewardModel,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    response_length: int,
) -> jnp.ndarray:
    """Scalar score at the last valid response token, zeros elsewhere
    (fsdp_workers.compute_rm_score:1645)."""
    B, S = input_ids.shape
    P = S - response_length
    pad_counts = jnp.sum(1 - attention_mask[:, :P], axis=1).astype(jnp.int32)
    scores = rm.apply(
        params, input_ids, positions=position_ids, kv_starts=pad_counts,
        kv_lens=jnp.sum(attention_mask, axis=1).astype(jnp.int32) + pad_counts,
    )
    resp_mask = attention_mask[:, -response_length:]
    last_idx = jnp.maximum(jnp.sum(resp_mask, axis=1).astype(jnp.int32) - 1, 0)
    last_scores = jnp.take_along_axis(
        scores[:, -response_length:], last_idx[:, None], axis=1
    )[:, 0]
    token_scores = jnp.zeros((B, response_length), jnp.float32)
    token_scores = token_scores.at[jnp.arange(B), last_idx].set(last_scores)
    return token_scores * resp_mask.astype(jnp.float32)
