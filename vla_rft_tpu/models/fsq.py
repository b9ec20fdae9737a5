"""Finite Scalar Quantization (FSQ) — https://arxiv.org/abs/2309.15505.

JAX port of the reference's torch adaptation
(train/verl/ivideogpt/tokenizer/finite_scalar_quantize.py:53-236).  FSQ is a
round-with-straight-through op over a small per-channel level grid — trivially
XLA-friendly (no codebook lookups, no EMA state).

Token-space facts for the LIBERO ctx_msp run: levels(12) = [7,5,5,5,5] ->
4375 codes (finite_scalar_quantize.py:230-236); ctx tokens offset +4375,
action tokens offset +8750, BOS 9006, EOS/PAD 9007, vocab 9008
(ivideogpt/processor.py:191-203, run_vla_rft.sh:56,75-77).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_fsq_levels(n: int) -> List[int]:
    return {
        8: [8, 6, 5],
        10: [8, 5, 5, 5],
        12: [7, 5, 5, 5, 5],
        14: [8, 8, 8, 6, 5],
        16: [8, 8, 8, 5, 5, 5],
    }[n]


class FSQ:
    """Stateless FSQ over the last axis (dim == len(levels))."""

    def __init__(self, levels: Sequence[int]):
        self.levels = np.asarray(levels, np.int32)
        self.basis = np.concatenate([[1], np.cumprod(self.levels[:-1])]).astype(np.int32)
        self.codebook_size = int(np.prod(self.levels))
        self.dim = len(levels)

    def bound(self, z: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
        levels = jnp.asarray(self.levels, z.dtype)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """Round with straight-through gradient; output normalized to [-1, 1]."""
        bounded = self.bound(z.astype(jnp.float32))
        rounded = jnp.round(bounded)
        quantized = bounded + jax.lax.stop_gradient(rounded - bounded)
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        return (quantized / half_width).astype(z.dtype)

    def codes_to_indices(self, zhat: jnp.ndarray) -> jnp.ndarray:
        """Normalized codes (..., d) -> flat indices (...)."""
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        scaled = zhat.astype(jnp.float32) * half_width + half_width
        return jnp.sum(jnp.round(scaled) * jnp.asarray(self.basis, jnp.float32), axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Flat indices (...) -> normalized codes (..., d)."""
        idx = indices[..., None].astype(jnp.int32)
        level_idx = (idx // jnp.asarray(self.basis, jnp.int32)) % jnp.asarray(
            self.levels, jnp.int32
        )
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        return (level_idx.astype(jnp.float32) - half_width) / half_width

    def __call__(self, z: jnp.ndarray):
        """quantize + indices (reference FSQ.forward, channels-last)."""
        codes = self.quantize(z)
        return codes, self.codes_to_indices(codes)
