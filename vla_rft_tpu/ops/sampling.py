"""Categorical sampling with temperature / top-k / top-p.

TPU-native replacement for vLLM's SamplingParams machinery used by the WM
rollout (reference: verl/workers/rollout/vllm_rollout/vllm_rollout.py:143-213
with top_p=0.8, temperature=1.0, top_k=-1 in the run).  Pure XLA, shaped for
use inside `lax.scan` decode loops: static vocab, no data-dependent shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask logits outside the top-k. k<=0 disables."""
    if k is None or k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float, iters: int = 26) -> jnp.ndarray:
    """Nucleus filtering. Keeps the smallest set of tokens with cumulative
    probability >= p (vLLM semantics: tokens whose prefix-exclusive cumsum
    < p survive). p>=1 disables.

    Sort-free: a token is kept iff the mass of strictly-more-probable tokens
    is < p, i.e. iff its probability exceeds t* = sup{t : mass(probs > t)
    >= p}.  t* is found by bisection — `iters` masked reduces over the vocab
    — instead of the full descending sort + cumsum.  TPU sorts are bitonic
    multi-pass affairs; at decode shapes (rows x 9008 vocab, once per
    generated token) the bisection is far cheaper and exact to pmax/2^iters
    (ties at the boundary are all kept, where the sort keeps an arbitrary
    subset — same renormalized distribution up to fp)."""
    if p is None or p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs > mid, probs, 0.0), axis=-1, keepdims=True)
        ge = mass >= p  # t* is above mid
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(pmax), pmax)
    )  # invariant: mass(probs > lo) >= p throughout
    return jnp.where(probs > lo, logits, NEG_INF)


def filtered_logits(
    logits: jnp.ndarray, temperature: float = 1.0, top_k: int = -1, top_p: float = 1.0
) -> jnp.ndarray:
    """Temperature + top-k + top-p filtered f32 logits — softmax of the
    result IS the sampling distribution (shared by sample_token and the
    speculative-decode acceptance math, which needs exact probabilities)."""
    logits = logits.astype(jnp.float32) / jnp.asarray(temperature, jnp.float32)
    logits = apply_top_k(logits, top_k)
    return apply_top_p(logits, top_p)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = -1,
    top_p: float = 1.0,
    do_sample: bool = True,
) -> jnp.ndarray:
    """Sample token ids from (..., V) logits. temperature==0 or
    do_sample=False -> greedy."""
    if not do_sample or temperature == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, filtered_logits(logits, temperature, top_k, top_p), axis=-1
    ).astype(jnp.int32)
