"""Masked statistics + logit helpers.

JAX counterparts of verl's torch_functional
(train/verl/verl/utils/torch_functional.py:48-180): logprobs_from_logits,
entropy_from_logits, masked mean/var/whiten, response masks.  All are pure
jnp — XLA fuses them into surrounding matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logprobs_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """log p(labels) from logits; float32 logsumexp for stability.

    logits: (..., V), labels: (...) int. Mirrors torch_functional.py:48-95
    (the flash-attn cross-entropy fast path is just a fused logsumexp; XLA
    does the same fusion).
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return picked - lse


def entropy_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """H = logsumexp - sum(p * logits) (torch_functional.py:106)."""
    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jax.nn.logsumexp(logits, axis=-1) - jnp.sum(p * logits, axis=-1)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-8):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + eps)


def masked_var(x: jnp.ndarray, mask: jnp.ndarray, unbiased: bool = True):
    mean = masked_mean(x, mask)
    centered = (x - mean) ** 2
    var = masked_mean(centered, mask)
    if unbiased:
        n = jnp.sum(mask)
        var = var * n / jnp.clip(n - 1, 1, None)
    return var


def masked_whiten(x: jnp.ndarray, mask: jnp.ndarray, shift_mean: bool = True):
    """(x - mean) / std over masked entries (torch_functional.py:113-148)."""
    mean = masked_mean(x, mask)
    var = masked_var(x, mask)
    whitened = (x - mean) * jax.lax.rsqrt(var + 1e-8)
    if not shift_mean:
        whitened = whitened + mean
    return whitened


def get_response_mask(response_ids: jnp.ndarray, eos_token_id: int, dtype=jnp.int32):
    """1 up to and including the first EOS, 0 after (torch_functional.py:150)."""
    is_eos = (response_ids == eos_token_id).astype(jnp.int32)
    seen = jnp.cumsum(is_eos, axis=-1) - is_eos  # eos count strictly before position
    return (seen == 0).astype(dtype)


def compute_position_id_with_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """cumsum(mask)-1 clipped at 0 (verl/utils/model.py:194)."""
    return jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None).astype(jnp.int32)
