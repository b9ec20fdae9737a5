"""Action-token masks over label sequences.

JAX port of prismatic/training/train_utils.py:8-41.  Token ids above
ACTION_TOKEN_BEGIN_IDX (=151386, tail of the Qwen2.5 vocab,
prismatic/vla/constants.py) are action tokens; the cumsum over non-IGNORE
labels splits them into the "current action" (first ACTION_DIM) and the
"next actions" (the rest) — 64 action-query positions total for LIBERO
(8 chunks x 7 dims + 8 stop tokens... see constants NUM_TOKENS=64).
"""
from __future__ import annotations

import jax.numpy as jnp

IGNORE_INDEX = -100
ACTION_TOKEN_BEGIN_IDX = 151386
ACTION_DIM = 7
NUM_ACTIONS_CHUNK = 8
PROPRIO_DIM = 8
NUM_TOKENS = 64


def get_current_action_mask(token_ids: jnp.ndarray) -> jnp.ndarray:
    not_ignore = token_ids != IGNORE_INDEX
    cumsum = jnp.cumsum(not_ignore, axis=1)
    mask = (1 <= cumsum) & (cumsum <= ACTION_DIM)
    return mask & (token_ids > ACTION_TOKEN_BEGIN_IDX)


def get_next_actions_mask(token_ids: jnp.ndarray) -> jnp.ndarray:
    not_ignore = token_ids != IGNORE_INDEX
    cumsum = jnp.cumsum(not_ignore, axis=1)
    mask = cumsum > ACTION_DIM
    return mask & (token_ids > ACTION_TOKEN_BEGIN_IDX)


def gather_masked(x: jnp.ndarray, mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Gather the first n True positions of mask per row, in order.

    XLA-friendly replacement for torch boolean indexing
    (`hidden[mask].reshape(B, n, -1)`, dp_actor.py:133): static output shape
    (B, n, ...). Rows must contain exactly n True entries (the collator
    guarantees 64 action tokens per sample).
    """
    B, S = mask.shape
    # stable order of True positions: sort key = (not mask, position)
    key = jnp.where(mask, jnp.arange(S)[None, :], S + jnp.arange(S)[None, :])
    idx = jnp.argsort(key, axis=-1)[:, :n]  # (B, n)
    return jnp.take_along_axis(x, idx[..., None], axis=1), idx


def scatter_rows(x: jnp.ndarray, idx: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Write values (B, n, D) into x (B, S, D) at per-row positions idx (B, n).

    Replacement for `_replace_input_embeddings`
    (modeling_prismatic.py:409-445)."""
    B = x.shape[0]
    batch_idx = jnp.arange(B)[:, None]
    return x.at[batch_idx, idx].set(values.astype(x.dtype))
