"""Pallas decode attention: one query token against a stacked KV cache.

The autoregressive WM/LLM decode loop is HBM-bandwidth-bound; the XLA path
pays a full layer-slice copy per step (`dynamic_index_in_dim` on the
(L, B, H, S, D) cache materializes ~100MB x 24 layers before attention reads
it again — doubling cache traffic).  This kernel instead lets the BlockSpec
index map slice the layer DIRECTLY out of the stacked cache using a
scalar-prefetched layer index, so each step reads the cache exactly once.

Replaces vLLM's paged-attention CUDA kernel in role
(verl/third_party/vllm/vllm_v_0_6_3 engine).

Cache layout: (L, B, H_kv, S, D) — (S, D) are the tiled dims.  When D = 64,
TPU HBM tiling pads the 64-lane rows to 128 — 2x memory AND 2x DMA traffic —
so the cache is stored PACKED: (L, B, H_kv/2, S, 2D) with head pair
(2h, 2h+1) sharing each 128-lane row (models/transformer.pack_kv_heads).
The kernel detects packing from the shapes; scores use zero-padded q rows
(the zeros annihilate the other head's lanes in the contraction) and both
heads' outputs combine into one packed store via a lane select.

q: (B, H_kv, G, D) where G = query heads per kv head (GQA group).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    li_ref,  # scalar prefetch (1,) layer index (unused in body; drives index map)
    kv_lens_ref,  # scalar prefetch (B,) valid lengths (incl. current token)
    kv_starts_ref,  # scalar prefetch (B,) first valid index (left padding)
    q_ref,  # VMEM (1, heads_in_block, G, D) — LOGICAL heads
    k_ref,  # VMEM (1, 1, Hb, S, Dc) — this layer's keys; Dc = D or 2D (packed)
    v_ref,  # VMEM (1, 1, Hb, S, Dc)
    *rest,  # [sk_ref, sv_ref] when quantized (logical-head scales), then o_ref
    scale: float,
    quantized: bool,
    packed: bool,
):
    if quantized:
        sk_ref, sv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    kv_len = kv_lens_ref[b]
    kv_start = kv_starts_ref[b]
    Hb = k_ref.shape[2]
    S = k_ref.shape[3]
    D = q_ref.shape[-1]
    per_row = 2 if packed else 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    mask = (pos < kv_len) & (pos >= kv_start)

    def attend(qfull, kk, vv, h):
        """qfull: (G, Dc) query padded to the cache row width; returns the
        (G, Dc) output of dot(softmax(q.k), v) — for packed rows, only this
        head's lane half is meaningful."""
        if quantized:
            # all (S, Dc)-sized math stays int8 on the MXU; scales fold into
            # the small (G, S)/(G,) tensors:
            #   s[g,s] = (q_i8 . k_i8[s]) * qs[g] * sk[s]
            #   out[g] = (p_i8 @ v_i8) * ps[g]  with p' = softmax * sv folded
            qs = jnp.maximum(jnp.max(jnp.abs(qfull), axis=-1), 1e-8) / 127.0
            q_i8 = jnp.clip(jnp.round(qfull / qs[:, None]), -127, 127).astype(jnp.int8)
            s_i32 = jax.lax.dot_general(
                q_i8, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )  # (G, S)
            sk = sk_ref[0, 0, h].astype(jnp.float32)  # (S,) per-position key scales
            s = s_i32.astype(jnp.float32) * qs[:, None] * sk[None, :]
        else:
            s = jax.lax.dot_general(
                qfull, kk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        if quantized:
            pv = p * sv_ref[0, 0, h].astype(jnp.float32)[None, :]  # fold v scales
            ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-30) / 127.0
            p_i8 = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
            out_i32 = jax.lax.dot_general(
                p_i8, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return out_i32.astype(jnp.float32) * ps / denom
        out = jax.lax.dot_general(
            p, vv.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out / denom

    for hp in range(Hb):  # static unroll over cache rows in this block
        kk = k_ref[0, 0, hp]
        vv = v_ref[0, 0, hp]
        outs = []
        for j in range(per_row):
            h = per_row * hp + j  # logical head index within the block
            q = q_ref[0, h].astype(jnp.float32) * scale  # (G, D)
            if packed:
                zero = jnp.zeros_like(q)
                qfull = jnp.concatenate([zero, q] if j else [q, zero], axis=-1)
            else:
                qfull = q
            outs.append(attend(qfull, kk, vv, h))
        if packed:
            lane = jax.lax.broadcasted_iota(jnp.int32, outs[0].shape, 1)
            o_ref[0, hp] = jnp.where(lane < D, outs[0], outs[1]).astype(o_ref.dtype)
        else:
            o_ref[0, hp] = outs[0].astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,  # (B, 1, Hq, D) single query token
    ck: jnp.ndarray,  # (L, B, Hc, S, Dc) stacked key cache (Hc=Hkv/2 packed)
    cv: jnp.ndarray,  # (L, B, Hc, S, Dc) stacked value cache
    layer_idx: jnp.ndarray,  # scalar int
    kv_lens: jnp.ndarray,  # (B,)
    kv_starts: Optional[jnp.ndarray] = None,
    scales: Optional[tuple] = None,  # (sk, sv) (L,B,Hkv,S) f32 for int8 caches
    scale: Optional[float] = None,
    interpret: bool = False,
    max_block_bytes: int = 8 * 1024 * 1024,  # per-array block; VMEM limit raised below
) -> jnp.ndarray:
    """Returns (B, 1, Hq, D).

    Grid is (B, head-groups) with as many cache rows per block as fit the
    VMEM budget — few large DMAs instead of per-head small ones (DMA-latency
    amortization is what makes this beat the XLA gather path)."""
    B, one, Hq, D = q.shape
    L, _, Hc, S, Dc = ck.shape
    packed = Dc == 2 * D
    Hkv = Hc * 2 if packed else Hc
    G = Hq // Hkv
    per_row = 2 if packed else 1
    if scale is None:
        scale = D**-0.5
    if kv_starts is None:
        kv_starts = jnp.zeros((B,), jnp.int32)

    per_head = S * Dc * jnp.dtype(ck.dtype).itemsize
    hg = max(1, min(Hc, max_block_bytes // max(per_head, 1)))
    while Hc % hg != 0:
        hg -= 1
    n_groups = Hc // hg
    hq_blk = hg * per_row  # logical heads per block
    quantized = scales is not None

    qg = q.reshape(B, Hkv, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_groups),
        in_specs=[
            pl.BlockSpec(
                (1, hq_blk, G, D), lambda b, g, li, kl, ks: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hg, S, Dc), lambda b, g, li, kl, ks: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hg, S, Dc), lambda b, g, li, kl, ks: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (1, 1, hq_blk, S), lambda b, g, li, kl, ks: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, hq_blk, S), lambda b, g, li, kl, ks: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            if quantized
            else []
        ),
        out_specs=pl.BlockSpec(
            (1, hg, G, Dc), lambda b, g, li, kl, ks: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=float(scale), quantized=quantized, packed=packed
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hc, G, Dc), q.dtype),
        interpret=interpret,
        # physical VMEM is ~128MB on v5e; the default 16MB scoped limit
        # forces tiny head blocks -> latency-bound DMAs
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * S * D,
            bytes_accessed=2 * B * Hc * S * Dc * jnp.dtype(ck.dtype).itemsize,
            transcendentals=B * Hq * S,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        kv_lens.astype(jnp.int32),
        kv_starts.astype(jnp.int32),
        qg,
        ck,
        cv,
        *(scales if quantized else ()),
    )
    if packed:  # (B, Hc, G, 2D) -> (B, Hkv, G, D) undoing the head pairing
        out = out.reshape(B, Hc, G, 2, D)
        out = jnp.swapaxes(out, 2, 3).reshape(B, Hkv, G, D)
    return out.reshape(B, 1, Hq, D)
