"""Autoregressive LLM generation for the text-RL path.

Replaces vLLM generation in verl's generic PPO trainer
(verl/workers/rollout/vllm_rollout/vllm_rollout_spmd.py and the naive_rollout)
with a `lax.scan` decode loop: left-padded prompts (vLLM convention the
trainer code assumes, vllm_rollout.py:279-288), per-row `kv_starts` masking,
positions counted from each row's first real token, EOS handled by masking
after generation (`get_response_mask`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vla_rft_tpu.models.transformer import Decoder
from vla_rft_tpu.ops.masked import get_response_mask
from vla_rft_tpu.ops.sampling import sample_token


@dataclasses.dataclass(frozen=True)
class LLMRolloutConfig:
    response_length: int = 128
    temperature: float = 1.0
    top_k: int = -1
    top_p: float = 1.0
    do_sample: bool = True
    eos_token_id: int = 2
    pad_token_id: int = 0
    # FIRE sampling (https://arxiv.org/abs/2410.21236, the reference's
    # fire_vllm_rollout): sample the FIRST token at a hotter temperature to
    # diversify rollouts, then continue at `temperature`.
    use_fire_sampling: bool = False
    fire_temperature: float = 3.0


def generate_sequences(
    llm: Decoder,
    params,
    rng: jax.Array,
    prompt_ids: jnp.ndarray,  # (B, P) LEFT-padded with pad_token
    cfg: LLMRolloutConfig,
    prefix_share_n: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Returns responses + full sequences + attention_mask + position_ids,
    matching the tensor contract of vllm_rollout.generate_sequences
    (vllm_rollout.py:291-300).

    prefix_share_n > 1 enables RadixAttention-style prompt-prefix sharing
    (the sglang_rollout's decisive idea, one level deep): rows are the n
    GRPO rollouts of B//n unique prompts laid out contiguously; the prompt
    KV is prefilled ONCE per unique into a read-only shared cache and every
    decode step attends [shared prefix | own response cache] via the
    split-cache path — prompt KV memory and attention reads / n."""
    B, P = prompt_ids.shape
    R = cfg.response_length
    pad_counts = jnp.sum((prompt_ids == cfg.pad_token_id).astype(jnp.int32), axis=1)
    # left padding: all pads are a prefix; first real token at pad_counts
    kv_starts = pad_counts
    prompt_lens = P - pad_counts

    positions = jnp.clip(
        jnp.arange(P, dtype=jnp.int32)[None, :] - kv_starts[:, None], 0, None
    )
    n = prefix_share_n
    shared_kw = {}
    if n > 1:
        assert B % n == 0, (B, n)
        B_u = B // n
        # rows are uniform runs of n per shared prefix: let the split-cache
        # kernel batch whole runs per grid iteration (divisor of n, capped)
        bb = max(d for d in range(1, n + 1) if n % d == 0 and d <= 16)
        if bb != llm.cfg.decode_block_b:
            llm = type(llm)(dataclasses.replace(llm.cfg, decode_block_b=bb))
        uniq = prompt_ids[::n]
        shared_cache = llm.init_cache(B_u, P)
        logits, _, shared_cache = llm.apply(
            params, uniq, positions=positions[::n], cache=shared_cache,
            cache_index=0, kv_starts=kv_starts[::n],
            kv_lens=jnp.full((B_u,), P, jnp.int32), logits_last_only=True,
        )
        last_logits = jnp.repeat(logits[:, -1], n, axis=0)  # (B, V)
        cache = llm.init_cache(B, R)  # own cache: response positions only
        shared_kw = dict(
            shared_cache=shared_cache, shared_len=P,
            prefix_map=jnp.repeat(jnp.arange(B_u, dtype=jnp.int32), n, axis=0),
            shared_starts=kv_starts,
        )
    else:
        cache = llm.init_cache(B, P + R)
        logits, _, cache = llm.apply(
            params, prompt_ids, positions=positions, cache=cache, cache_index=0,
            kv_starts=kv_starts, kv_lens=jnp.full((B,), P, jnp.int32),
            logits_last_only=True,
        )
        last_logits = logits[:, -1]

    def step(carry, i):
        cache, last_logits, key = carry
        key, sub = jax.random.split(key)
        if cfg.use_fire_sampling:
            temp = jnp.where(i == 0, cfg.fire_temperature, cfg.temperature)
            logits_t = last_logits.astype(jnp.float32) / temp[..., None]
            tok = sample_token(sub, logits_t, 1.0, cfg.top_k, cfg.top_p, cfg.do_sample)
        else:
            tok = sample_token(
                sub, last_logits, cfg.temperature, cfg.top_k, cfg.top_p, cfg.do_sample
            )
        pos = (prompt_lens + i).astype(jnp.int32)[:, None]
        step_logits, _, cache = llm.apply(
            params, tok[:, None], positions=pos, cache=cache, cache_index=P + i,
            kv_starts=kv_starts, kv_lens=jnp.full((B,), P + i + 1, jnp.int32),
            **shared_kw,
        )
        return (cache, step_logits[:, 0], key), tok

    (_, _, _), toks = jax.lax.scan(
        step, (cache, last_logits, rng), jnp.arange(R)
    )
    responses = toks.T.astype(jnp.int32)  # (B, R)

    response_mask = get_response_mask(responses, cfg.eos_token_id)
    # post-EOS tokens -> pad (vLLM pads finished sequences)
    responses = jnp.where(response_mask == 1, responses, cfg.pad_token_id)

    input_ids = jnp.concatenate([prompt_ids, responses], axis=1)
    prompt_mask = (jnp.arange(P)[None, :] >= kv_starts[:, None]).astype(jnp.int32)
    attention_mask = jnp.concatenate([prompt_mask, response_mask], axis=1)
    resp_positions = prompt_lens[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :]
    position_ids = jnp.concatenate([positions, resp_positions], axis=1)
    return {
        "prompts": prompt_ids,
        "responses": responses,
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "position_ids": position_ids,
        "response_mask": response_mask,
    }


def compute_log_probs(
    llm: Decoder,
    params,
    input_ids: jnp.ndarray,  # (B, P+R) as returned by generate_sequences
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    response_length: int,
    temperature: float = 1.0,
):
    """Teacher-forced token logprobs + entropy over the response region
    (dp_actor text path / dp_world_model.py:47-133)."""
    from vla_rft_tpu.ops.masked import entropy_from_logits, logprobs_from_logits

    B, S = input_ids.shape
    P = S - response_length
    pad_counts = jnp.sum(1 - attention_mask[:, :P], axis=1).astype(jnp.int32)
    logits, _, _ = llm.apply(
        params, input_ids, positions=position_ids, kv_starts=pad_counts,
        kv_lens=jnp.sum(attention_mask, axis=1).astype(jnp.int32) + pad_counts,
    )
    resp = input_ids[:, -response_length:]
    pred_logits = logits[:, -response_length - 1 : -1] / temperature
    logp = logprobs_from_logits(pred_logits, resp)
    ent = entropy_from_logits(pred_logits)
    return logp, ent
