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
    # bounded exp: the floor keeps masked lanes (~-1e30) from feeding expf UB
    # under fast-math backends (interpret mode runs on XLA:CPU); the where
    # zeroes them exactly (exp(-80) == 0 in f32 softmax terms)
    p = jnp.where(mask, jnp.exp(jnp.maximum(s - m, -80.0)), 0.0)  # (N, S)
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


def _shared_decode_kernel(
    li_ref,  # scalar prefetch (1,) layer index (drives index maps)
    kv_lens_ref,  # scalar prefetch (B,) valid OWN-cache lengths (incl. current)
    pm_ref,  # scalar prefetch (B,) row -> shared-cache row
    ss_ref,  # scalar prefetch (B,) first valid SHARED position (left padding)
    q_ref,  # VMEM (1, heads_in_block, G*Sq, D) — LOGICAL heads
    k_ref,  # VMEM (1, 1, Hb, Sr, Dc) own keys
    v_ref,  # VMEM (1, 1, Hb, Sr, Dc)
    sk_ref,  # VMEM (1, 1, Hb, Sp, Dc) shared keys (this row's unique prefix)
    sv_ref,  # VMEM (1, 1, Hb, Sp, Dc)
    *rest,  # [qk_ref, qv_ref, qsk_ref, qsv_ref] int8 scales, then o_ref
    scale: float,
    quantized: bool,
    packed: bool,
    sq: int,
    shared_valid: int,
    row_chunk: int,
):
    """Split-cache decode: every query row attends to its own (short) cache
    segment PLUS a prefix segment shared by many batch rows.  The shared
    block's index map routes through a scalar-prefetched `prefix_map`, so
    consecutive grid rows with the same prefix revisit the SAME block and
    Pallas elides the DMA — the n rollouts of one sample read the prompt's
    cache once instead of n times (the decisive traffic cut: the prompt is
    ~2/3 of the KV positions at LIBERO shapes).

    Supports Sq>1 small query blocks (the 7 teacher-forced action tokens per
    frame ride the same kernel instead of materializing a full layer slice
    on the XLA path); causal masking inside the block via per-row query
    offsets.  Head-vectorized like `_decode_kernel`: one (N, Dc) x (S, Dc)^T
    MXU dot per segment with N = logical_heads * G * Sq query rows."""
    if quantized:
        qk_ref, qv_ref, qsk_ref, qsv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    Bb = k_ref.shape[1]  # batch rows per iteration (all share one prefix row)
    Hb = k_ref.shape[2]
    Sr = k_ref.shape[3]
    Sp = sk_ref.shape[3]
    Dc = k_ref.shape[4]
    D = q_ref.shape[-1]
    per_row = 2 if packed else 1
    HL = Hb * per_row
    GS = q_ref.shape[2]  # G * Sq
    # rows are processed in chunks of `row_chunk`: the block-diagonal trick's
    # temps are (N, R*S) with N = cb*HL*GS and R = cb*Hb — quadratic in the
    # chunk — so big grid blocks (which amortize per-iteration overhead and
    # shared-block DMA) are paired with a bounded inner chunk
    cb = max(1, min(row_chunk, Bb))
    while Bb % cb:
        cb -= 1

    for ci in range(Bb // cb):
        rows = slice(ci * cb, (ci + 1) * cb)
        N = cb * HL * GS  # this chunk's query rows, vectorized together

        # per-row own-cache valid lengths, broadcast to the N query rows
        kv_vec = jnp.concatenate(
            [
                jnp.full((HL * GS, 1), kv_lens_ref[b * Bb + ci * cb + i], jnp.int32)
                for i in range(cb)
            ]
        )  # (N, 1)

        # ---- queries (N, Dc), packed pairs zero-padded into lane halves
        q = q_ref[rows].astype(jnp.float32).reshape(N, D) * scale
        if packed:
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * D), 1)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * D), 0)
            odd = (row_i // GS) % 2
            qfull = jnp.where(
                (lane2 < D) == (odd == 0), jnp.concatenate([q, q], -1), 0.0
            )
        else:
            qfull = q

        if quantized:
            qs = (
                jnp.maximum(jnp.max(jnp.abs(qfull), axis=-1, keepdims=True), 1e-8)
                / 127.0
            )
            q_i8 = jnp.clip(jnp.round(qfull / qs), -127, 127).astype(jnp.int8)

        def seg_scores(kk, scale_arr, S, R, shared_seg, qs=None, q_i8=None, qfull=None):
            """(N, S) scores for one cache segment via the block-diagonal
            trick.  R = flattened cache rows in the segment (cb*Hb own, Hb
            shared — the chunk's rows SHARE the prefix block)."""
            row0 = jax.lax.broadcasted_iota(jnp.int32, (N, R * S), 0) // (GS * per_row)
            if shared_seg:
                row0 = row0 % Hb  # every batch row maps onto the one shared block
            seg_of = jax.lax.broadcasted_iota(jnp.int32, (N, R * S), 1) // S
            own2 = row0 == seg_of
            if quantized:
                big = jax.lax.dot_general(
                    q_i8, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
                )
                s = (
                    jnp.sum(jnp.where(own2, big, 0).reshape(N, R, S), axis=1).astype(
                        jnp.float32
                    )
                    * qs
                )
                # scales are per LOGICAL head: R*per_row rows
                sk = jnp.repeat(scale_arr, GS, axis=0)
                if shared_seg and cb > 1:
                    sk = jnp.concatenate([sk] * cb)
                s = s * sk
            else:
                big = jax.lax.dot_general(
                    qfull, kk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = jnp.sum(jnp.where(own2, big, 0.0).reshape(N, R, S), axis=1)
            return s, own2

        kw = dict(qs=qs, q_i8=q_i8, qfull=qfull) if quantized else dict(qfull=qfull)
        s_sh, own2_sh = seg_scores(
            sk_ref[0, 0].reshape(Hb * Sp, Dc),
            qsk_ref[0, 0].astype(jnp.float32).reshape(HL, Sp) if quantized else None,
            Sp, Hb, True, **kw,
        )
        s_ow, own2_ow = seg_scores(
            k_ref[0, rows].reshape(cb * Hb * Sr, Dc),
            qk_ref[0, rows].astype(jnp.float32).reshape(cb * HL, Sr)
            if quantized
            else None,
            Sr, cb * Hb, False, **kw,
        )

        # masks: shared prefix fully valid up to shared_valid (static); own
        # cache causal per query row — row n's query sits at own position
        # kv_len - Sq + (n % Sq), so it sees own pos <= that
        pos_sh = jax.lax.broadcasted_iota(jnp.int32, (N, Sp), 1)
        ss = ss_ref[b * Bb]  # rows of a block share the prefix row (and pads)
        sh_ok = (pos_sh < shared_valid) & (pos_sh >= ss)
        s_sh = jnp.where(sh_ok, s_sh, NEG_INF)
        pos_ow = jax.lax.broadcasted_iota(jnp.int32, (N, Sr), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (N, Sr), 0) % sq
        s_ow = jnp.where(pos_ow < kv_vec - (sq - 1) + qi, s_ow, NEG_INF)

        m = jnp.maximum(
            jnp.max(s_sh, axis=-1, keepdims=True), jnp.max(s_ow, axis=-1, keepdims=True)
        )
        # bounded exp (see decode_attention): mask via select, not -1e30
        p_sh = jnp.where(sh_ok, jnp.exp(jnp.maximum(s_sh - m, -80.0)), 0.0)
        p_ow = jnp.where(
            pos_ow < kv_vec - (sq - 1) + qi, jnp.exp(jnp.maximum(s_ow - m, -80.0)), 0.0
        )
        denom = jnp.maximum(
            jnp.sum(p_sh, -1, keepdims=True) + jnp.sum(p_ow, -1, keepdims=True), 1e-30
        )

        def seg_pv(p, vv, scale_arr, own2, S, R, shared_seg):
            if quantized:
                sv = jnp.repeat(scale_arr, GS, axis=0)
                if shared_seg and cb > 1:
                    sv = jnp.concatenate([sv] * cb)
                pv = p * sv
                ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-30) / 127.0
                p_i8 = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
                bd = jnp.where(own2, jnp.concatenate([p_i8] * R, axis=1), 0)
                return (
                    jax.lax.dot_general(
                        bd, vv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    * ps
                )
            bd = jnp.where(own2, jnp.concatenate([p] * R, axis=1), 0.0)
            return jax.lax.dot_general(
                bd, vv.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out = (
            seg_pv(
                p_sh,
                sv_ref[0, 0].reshape(Hb * Sp, Dc),
                qsv_ref[0, 0].astype(jnp.float32).reshape(HL, Sp) if quantized else None,
                own2_sh, Sp, Hb, True,
            )
            + seg_pv(
                p_ow,
                v_ref[0, rows].reshape(cb * Hb * Sr, Dc),
                qv_ref[0, rows].astype(jnp.float32).reshape(cb * HL, Sr)
                if quantized
                else None,
                own2_ow, Sr, cb * Hb, False,
            )
        ) / denom

        if packed:  # combine pair lanes: even head [0,D), odd head [D,2D)
            o = out.reshape(cb * Hb, per_row * GS * Dc)
            a = o[:, : GS * Dc].reshape(cb * Hb * GS, Dc)
            bqd = o[:, GS * Dc :].reshape(cb * Hb * GS, Dc)
            lane = jax.lax.broadcasted_iota(jnp.int32, (cb * Hb * GS, Dc), 1)
            o_ref[rows] = (
                jnp.where(lane < D, a, bqd).reshape(cb, Hb, GS, Dc).astype(o_ref.dtype)
            )
        else:
            o_ref[rows] = out.reshape(cb, Hb, GS, Dc).astype(o_ref.dtype)


def decode_attention_shared(
    q: jnp.ndarray,  # (B, Sq, Hq, D) small query block (Sq <= 8)
    ck: jnp.ndarray,  # (L, B, Hc, Sr, Dc) own (response) cache
    cv: jnp.ndarray,
    sck: jnp.ndarray,  # (L, B_u, Hc, Sp, Dc) shared prefix cache (read-only)
    scv: jnp.ndarray,
    layer_idx: jnp.ndarray,
    kv_lens_own: jnp.ndarray,  # (B,) valid own positions incl. current block
    prefix_map: jnp.ndarray,  # (B,) row -> shared-cache row
    shared_valid: int,  # static count of valid shared positions
    scales: Optional[tuple] = None,  # own (sk, sv) (L, B, Hkv, Sr)
    shared_scales: Optional[tuple] = None,  # (ssk, ssv) (L, B_u, Hkv, Sp)
    scale: Optional[float] = None,
    interpret: bool = False,
    block_b: int = 1,
    row_chunk: Optional[int] = None,
    shared_starts: Optional[jnp.ndarray] = None,  # (B,) first valid shared pos
) -> jnp.ndarray:
    """Returns (B, Sq, Hq, D). See `_shared_decode_kernel`.

    block_b: batch rows per grid iteration.  REQUIRES every row of a block
    to share the same prefix_map entry (callers group the n rollouts of a
    sample contiguously, so any block_b dividing n is safe).  Amortizes the
    per-iteration serialized-op latency (~1.2us/row/layer measured at B=128).

    row_chunk: rows VECTORIZED together inside an iteration (default: the
    whole block, capped so the block-diagonal temps stay in VPU budget).
    block_b > row_chunk trades wider blocks (fewer iterations, shared-block
    DMA loaded once per block) for a static inner loop of proven-size math."""
    B, Sq, Hq, D = q.shape
    L, _, Hc, Sr, Dc = ck.shape
    Sp = sck.shape[3]
    packed = Dc == 2 * D
    Hkv = Hc * 2 if packed else Hc
    G = Hq // Hkv
    per_row = 2 if packed else 1
    if scale is None:
        scale = D**-0.5
    quantized = scales is not None
    Bb = block_b
    while B % Bb != 0:
        Bb -= 1
    # vectorized query rows per inner chunk (VPU temps are (N, Hb*S) f32)
    cb = row_chunk if row_chunk is not None else Bb
    while cb > 1 and cb * Hq * Sq > 256:
        cb //= 2
    while Bb % cb != 0:
        cb -= 1

    # one head group (WM shapes fit VMEM comfortably: both segments < 5MB)
    hg = Hc
    hq_blk = hg * per_row

    # (B, Sq, Hq, D) -> (B, Hkv, G*Sq, D): head-major, query-position fastest
    qg = (
        jnp.swapaxes(q, 1, 2).reshape(B, Hkv, G, Sq, D).reshape(B, Hkv, G * Sq, D)
    )

    if shared_starts is None:
        shared_starts = jnp.zeros((B,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // Bb, 1),
        in_specs=[
            pl.BlockSpec(
                (Bb, hq_blk, G * Sq, D), lambda b, g, li, kl, pm, ss: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Bb, hg, Sr, Dc), lambda b, g, li, kl, pm, ss: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Bb, hg, Sr, Dc), lambda b, g, li, kl, pm, ss: (li[0], b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # shared blocks: consecutive b with equal prefix_map revisit the
            # same block -> DMA elided by the pipeline
            pl.BlockSpec(
                (1, 1, hg, Sp, Dc),
                lambda b, g, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hg, Sp, Dc),
                lambda b, g, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (1, Bb, hq_blk, Sr), lambda b, g, li, kl, pm, ss: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Bb, hq_blk, Sr), lambda b, g, li, kl, pm, ss: (li[0], b, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, hq_blk, Sp),
                    lambda b, g, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, hq_blk, Sp),
                    lambda b, g, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], g, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            if quantized
            else []
        ),
        out_specs=pl.BlockSpec(
            (Bb, hg, G * Sq, Dc), lambda b, g, li, kl, pm, ss: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _shared_decode_kernel, scale=float(scale), quantized=quantized,
            packed=packed, sq=Sq, shared_valid=int(shared_valid), row_chunk=cb,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hc, G * Sq, Dc), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Sq * Hq * (Sr + Sp) * D,
            bytes_accessed=2
            * B
            * Hc
            * Sr
            * Dc
            * jnp.dtype(ck.dtype).itemsize,  # shared reads amortized away
            transcendentals=B * Sq * Hq * (Sr + Sp),
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        kv_lens_own.astype(jnp.int32),
        prefix_map.astype(jnp.int32),
        shared_starts.astype(jnp.int32),
        qg,
        ck,
        cv,
        sck,
        scv,
        *(scales if quantized else ()),
        *(shared_scales if quantized else ()),
    )
    # (B, Hc, G*Sq, Dc) -> (B, Sq, Hq, D)
    if packed:
        out = out.reshape(B, Hc, G * Sq, 2, D)
        out = jnp.swapaxes(out, 2, 3).reshape(B, Hkv, G * Sq, D)
    out = out.reshape(B, Hkv, G, Sq, D)
    return jnp.swapaxes(out, 1, 3).swapaxes(2, 3).reshape(B, Sq, Hq, D)


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
