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
    """Head-VECTORIZED body: all heads' scores/softmax/PV in a handful of
    wide ops instead of a per-head python loop — at decode shapes (one query
    token) the kernel is bound by serialized small-op latency, not HBM
    bandwidth (measured ~11us/seq/layer for the loop body vs ~4.2us of DMA
    at B=64, S=1664).

    Trick: with R cache rows (Hb) and N = Hb*per_row*G query rows, compute
    scores as ONE (N, Dc) x (R*S, Dc)^T MXU dot -> (N, R, S), then keep only
    each query row's own cache row via a mask-reduce over R (the off-row
    products are wasted MXU flops — 27 MFLOP at WM shapes, i.e. free). PV
    uses the same trick transposed: block-diagonal (N, R*S) @ (R*S, Dc).
    Packed head pairs ride the same path — zero-padded q lanes annihilate
    the partner head's half of each 128-lane row."""
    if quantized:
        sk_ref, sv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    Bb = k_ref.shape[1]  # batch rows per block (amortizes per-iteration cost)
    Hb = k_ref.shape[2]  # cache rows in this block
    S = k_ref.shape[3]
    Dc = k_ref.shape[4]
    G = q_ref.shape[2]
    D = q_ref.shape[-1]
    per_row = 2 if packed else 1
    HL = Hb * per_row  # logical heads in this block
    N = HL * G  # query rows

    for bi in range(Bb):  # static unroll over the block's batch rows
        _decode_one(
            bi, kv_lens_ref[b * Bb + bi], kv_starts_ref[b * Bb + bi],
            q_ref, k_ref, v_ref,
            sk_ref if quantized else None, sv_ref if quantized else None,
            o_ref, scale=scale, quantized=quantized, packed=packed,
            dims=(Hb, S, Dc, G, D, per_row, HL, N),
        )


def _decode_one(
    bi, kv_len, kv_start, q_ref, k_ref, v_ref, sk_ref, sv_ref, o_ref,
    *, scale, quantized, packed, dims
):
    Hb, S, Dc, G, D, per_row, HL, N = dims
    # ---- build (N, Dc) queries: packed pairs zero-padded into lane halves
    q = q_ref[bi].astype(jnp.float32).reshape(N, D) * scale
    if packed:
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * D), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * D), 0)
        odd = (row_i // G) % 2  # logical head parity per query row
        qfull = jnp.where(
            (lane2 < D) == (odd == 0),
            jnp.concatenate([q, q], axis=-1),
            0.0,
        )
    else:
        qfull = q

    # diagonal-block selector in 2D (Mosaic rejects 3D i1 broadcasts):
    # lane l of the (N, Hb*S) score matrix belongs to cache row l // S;
    # query row n attends to row (n // G) // per_row
    row_of = jax.lax.broadcasted_iota(jnp.int32, (N, Hb * S), 0) // (G * per_row)
    seg_of = jax.lax.broadcasted_iota(jnp.int32, (N, Hb * S), 1) // S
    own2 = row_of == seg_of  # (N, Hb*S)

    kk = k_ref[0, bi].reshape(Hb * S, Dc)  # (R*S, Dc)
    vv = v_ref[0, bi].reshape(Hb * S, Dc)

    if quantized:
        qs = jnp.maximum(jnp.max(jnp.abs(qfull), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(qfull / qs), -127, 127).astype(jnp.int8)
        big = jax.lax.dot_general(
            q_i8, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # (N, Hb*S)
        s = (
            jnp.sum(jnp.where(own2, big, 0).reshape(N, Hb, S), axis=1).astype(
                jnp.float32
            )
            * qs
        )
        # per-position key scales, repeated over the G query rows of a head
        sk = sk_ref[0, bi].astype(jnp.float32)  # (HL, S)
        if G > 1:
            sk = jnp.repeat(sk, G, axis=0)
        s = s * sk
    else:
        big = jax.lax.dot_general(
            qfull, kk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.sum(jnp.where(own2, big, 0.0).reshape(N, Hb, S), axis=1)

    pos = jax.lax.broadcasted_iota(jnp.int32, (N, S), 1)
    mask = (pos < kv_len) & (pos >= kv_start)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)  # (N, S)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    if quantized:
        sv = sv_ref[0, bi].astype(jnp.float32)
        if G > 1:
            sv = jnp.repeat(sv, G, axis=0)
        pv = p * sv  # fold per-position v scales
        ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-30) / 127.0
        p_i8 = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
        # block-diagonal (N, R*S): tile p across segments, zero other rows',
        # then ONE big dot against the flattened v rows
        bd = jnp.where(own2, jnp.concatenate([p_i8] * Hb, axis=1), 0)
        out = jax.lax.dot_general(
            bd, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * ps / denom
    else:
        bd = jnp.where(own2, jnp.concatenate([p] * Hb, axis=1), 0.0)
        out = (
            jax.lax.dot_general(
                bd, vv.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / denom
        )

    # combine packed pairs: even head's lanes [0,D), odd head's [D,2D)
    if packed:
        o = out.reshape(Hb, per_row * G * Dc)
        a = o[:, : G * Dc].reshape(Hb * G, Dc)  # even heads
        bqd = o[:, G * Dc :].reshape(Hb * G, Dc)  # odd heads
        lane = jax.lax.broadcasted_iota(jnp.int32, (Hb * G, Dc), 1)
        o_ref[bi] = jnp.where(lane < D, a, bqd).reshape(Hb, G, Dc).astype(o_ref.dtype)
    else:
        o_ref[bi] = out.reshape(Hb, G, Dc).astype(o_ref.dtype)


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
    block_b: Optional[int] = None,  # batch rows per grid iteration (None = auto)
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

    # batch rows per grid iteration. Measured on v5e at WM shapes: Bb=8 is
    # ~3% SLOWER than Bb=1 (the body work is serialized either way and the
    # per-iteration machinery is already hidden behind the row DMA), so the
    # default stays 1; the knob remains for other shapes.
    if block_b is None:
        block_b = 1
    while B % block_b != 0:
        block_b -= 1
    Bb = block_b

    qg = q.reshape(B, Hkv, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // Bb, n_groups),
        in_specs=[
            pl.BlockSpec(
                (Bb, hq_blk, G, D), lambda b, g, li, kl, ks: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Bb, hg, S, Dc), lambda b, g, li, kl, ks: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Bb, hg, S, Dc), lambda b, g, li, kl, ks: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (1, Bb, hq_blk, S), lambda b, g, li, kl, ks: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Bb, hq_blk, S), lambda b, g, li, kl, ks: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            if quantized
            else []
        ),
        out_specs=pl.BlockSpec(
            (Bb, hg, G, Dc), lambda b, g, li, kl, ks: (b, g, 0, 0),
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
