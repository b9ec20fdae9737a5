"""Ulysses-style sequence parallelism over a mesh axis.

TPU-native port of DeepSpeed-Ulysses as used by the reference
(train/verl/verl/utils/ulysses.py:61-194 SeqAllToAll + the flash-attn monkey
patch, verl/models/transformers/monkey_patch.py:44-140): sequences are
sharded over the `sp` mesh axis; around attention an all-to-all swaps the
sequence and head dimensions so each shard holds the full sequence for
heads/sp heads.  On TPU the all-to-all is an ICI collective emitted by
`shard_map` — no process groups, no NCCL.

KV-head repetition when sp > num_kv_heads mirrors monkey_patch.py:76-78.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vla_rft_tpu.ops.attention import attention


def all_to_all_seq2head(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S/sp, H, D) per shard -> (B, S, H/sp, D) per shard
    (ulysses.py SeqAllToAll forward, scatter heads / gather sequence)."""
    sp = jax.lax.psum(1, axis_name)
    B, s_local, H, D = x.shape
    assert H % sp == 0, f"heads {H} not divisible by sp {sp}"
    # split heads into sp groups -> all_to_all over the group dim
    x = x.reshape(B, s_local, sp, H // sp, D)
    # move the sp dim first for the collective
    x = jnp.moveaxis(x, 2, 0)  # (sp, B, s_local, H/sp, D)
    x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=False)
    # now dim0 indexes the remote sequence chunks
    x = jnp.moveaxis(x, 0, 1)  # (B, sp, s_local, H/sp, D)
    return x.reshape(B, sp * s_local, H // sp, D)


def all_to_all_head2seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S, H/sp, D) per shard -> (B, S/sp, H, D) per shard (inverse)."""
    sp = jax.lax.psum(1, axis_name)
    B, S, h_local, D = x.shape
    assert S % sp == 0
    x = x.reshape(B, sp, S // sp, h_local, D)
    x = jnp.moveaxis(x, 1, 0)  # (sp, B, S/sp, h_local, D)
    x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=False)
    # dim0 now indexes the source shard = head group; keep it BEFORE h_local
    x = jnp.moveaxis(x, 0, 2)  # (B, S/sp, sp, h_local, D)
    return x.reshape(B, S // sp, sp * h_local, D)


def repeat_kv_heads(k: jnp.ndarray, sp: int) -> jnp.ndarray:
    """Repeat KV heads so they divide sp (monkey_patch.py:76-78)."""
    nkv = k.shape[2]
    if nkv % sp == 0:
        return k
    reps = (sp + nkv - 1) // nkv
    return jnp.repeat(k, reps, axis=2)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "sp",
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    impl: str = "xla",
):
    """Sequence-parallel attention: inputs sharded (B, S/sp, H, D) over
    `axis_name`; output sharded the same way."""
    sp = mesh.shape[axis_name]

    def inner(q, k, v, kv_lens):
        k = repeat_kv_heads(k, sp)
        v = repeat_kv_heads(v, sp)
        qh = all_to_all_seq2head(q, axis_name)
        kh = all_to_all_seq2head(k, axis_name)
        vh = all_to_all_seq2head(v, axis_name)
        out = attention(qh, kh, vh, causal=causal, kv_lens=kv_lens, impl=impl)
        return all_to_all_head2seq(out, axis_name)

    spec = P(None, axis_name, None, None)
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, kv_lens if kv_lens is not None else jnp.full((q.shape[0],), q.shape[1], jnp.int32))


def ulysses_pad_and_slice(x: jnp.ndarray, sp: int, axis: int = 1):
    """Pad sequence to a multiple of sp (ulysses_pad_and_slice_inputs,
    ulysses.py:252-288). Returns (padded, pad)."""
    S = x.shape[axis]
    pad = (-S) % sp
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, pad
