"""Critic (value) model: decoder trunk + scalar token-value head.

Counterpart of the reference CriticWorker's AutoModelForTokenClassification
value model (verl/workers/fsdp_workers.py:1134-1415) and DataParallelPPOCritic
(verl/workers/critic/dp_critic.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig


class CriticModel(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, positions=None, kv_lens=None, kv_starts=None):
        _, hidden, _ = Decoder(self.cfg, name="backbone")(
            input_ids, positions=positions, kv_lens=kv_lens, kv_starts=kv_starts,
            compute_logits=False,
        )
        values = nn.Dense(
            1, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
            name="value_head",
        )(hidden.astype(jnp.float32))
        return values[..., 0]  # (B, S)


def compute_values(
    critic: CriticModel, params, input_ids, attention_mask, position_ids, response_length
):
    """dp_critic.compute_values: values over the response region, padding
    zeroed."""
    P = input_ids.shape[1] - response_length
    pad_counts = jnp.sum(1 - attention_mask[:, :P], axis=1).astype(jnp.int32)
    values = critic.apply(
        params, input_ids, positions=position_ids, kv_starts=pad_counts,
        kv_lens=jnp.sum(attention_mask, axis=1).astype(jnp.int32) + pad_counts,
    )
    # value at position t predicts from token t; response values are the
    # positions preceding each response token
    v = values[:, -response_length - 1 : -1]
    return v * attention_mask[:, -response_length:].astype(v.dtype)
