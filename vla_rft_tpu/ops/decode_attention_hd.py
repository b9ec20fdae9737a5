"""Decode attention over a HEAD-DENSE KV cache: (L, B, S, Hkv*D).

Second-generation decode kernel (replaces ops/decode_attention.py's packed
(L, B, H, S, D) layout when TransformerConfig.kv_layout == "hd").  Motivation,
from the round-2 profiling (DESIGN_NOTES "decode is SCALAR-bound"): the
packed kernel is bound by VPU work on its block-diagonal temporaries —
scores are computed as (N, R*S) with R = row_chunk * cache_heads, an
Hb(=8)x waste factor in the mask/extract stage — and by per-iteration
serialized op latency at small row blocks (~3x its own DMA floor).

Storing each position's heads CONTIGUOUSLY on the lane dim fixes both:

* one cache position is one (Hkv*D)-lane row (WM: 16 heads x 64 = 1024
  lanes — naturally 128-aligned, so the old head-PAIR packing trick is
  unnecessary);
* queries become a block-diagonal (N, Hkv*D) matrix (row n carries head
  h(n)'s 64 values in lanes [h*D, (h+1)*D)), so scores for a cache segment
  are ONE MXU dot with NO head-factor waste in the (N, S) score space:
  s[n, s] = q_bd[n] . K[s] picks out exactly head h(n)'s contraction, the
  other heads' lanes being zeros;
* the SHARED prefix segment (the majority of positions at LIBERO shapes:
  1088 of ~1700) is scored completely waste-free — every query row of the
  whole row-block contracts against the same (Sp, HD) block;
* the per-row OWN segment still needs a block-diagonal over rows, but its
  waste factor is the row sub-chunk size (2-4), not row_chunk*heads
  (16-64): ~8x less VPU traffic at WM shapes;
* k/v leave the projection as (B, S, Hkv, D) — reshaping to (B, S, HD) is
  free, so the cache WRITE path loses its transpose (the packed layout
  needed swapaxes(1, 2) + pair packing every decode step).

Scales for int8 caches stay in the old (L, B, Hkv, S) layout — the score
stage consumes them as (N, S) broadcasts keyed by head-of-row, which does
not care how heads sit in the cache arrays.

Role parity: replaces vLLM's paged-attention CUDA kernels
(reference verl/third_party/vllm/vllm_v_0_6_3 engine internals).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _hd_attend(
    q_blk,  # (cb, Hkv, GS, D) raw queries
    k_own,  # (cb, Sr, HD)
    v_own,  # (cb, Sr, HD)
    k_sh,  # (Sp, HD) or None
    v_sh,  # (Sp, HD) or None
    sk_own,  # (cb, Hkv, Sr) f32 or None (int8 cache)
    sv_own,
    sk_sh,  # (Hkv, Sp) f32 or None
    sv_sh,
    kv_vec,  # (N, 1) int32 per-query-row own valid length (incl. current block)
    sh_lo,  # scalar int32 first valid shared position
    sh_hi,  # static int: valid shared positions
    *,
    scale: float,
    sq: int,
    own_chunk: int,
    out_dtype,
    starts_vec=None,  # (N, 1) int32 per-row first valid own position, or None
):
    """Core math shared by both kernels.  Returns (cb, Hkv, GS, D).

    Query-row order n = ((r * Hkv + h) * GS + gs); GS = G * Sq.
    """
    cb, Hkv, GS, D = q_blk.shape
    HD = k_own.shape[-1]
    Sr = k_own.shape[1]
    N = cb * Hkv * GS
    quantized = sk_own is not None
    shared = k_sh is not None

    # Lane-group selection matrix: sel[l, d] = (l % D == d).  Used both to
    # tile (N, D) -> (N, HD) (q build) and to reduce (N, HD) -> (N, D)
    # (head-lane extraction).  Mosaic rejects the equivalent
    # (N, HD) <-> (N, HD//D, D) shape casts ("infer-vector-layout:
    # unsupported shape cast", the round-2 BENCH blocker) — a constant 2D
    # matmul lowers cleanly and its FLOPs (N*HD*D) are noise.
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (HD, D), 0) % D
        == jax.lax.broadcasted_iota(jnp.int32, (HD, D), 1)
    ).astype(jnp.float32)

    # ---- block-diagonal queries: (N, HD), head h(n)'s values in its lanes
    q2 = q_blk.astype(jnp.float32).reshape(N, D) * scale
    row_h = (jax.lax.broadcasted_iota(jnp.int32, (N, HD), 0) // GS) % Hkv
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (N, HD), 1) // D
    q_tiled = jax.lax.dot_general(
        q2, sel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    qb = jnp.where(lane_h == row_h, q_tiled, 0.0)
    if quantized:
        qs = jnp.maximum(jnp.max(jnp.abs(qb), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(qb / qs), -127, 127).astype(jnp.int8)

    def rep_heads(sc):  # (c, Hkv, S) -> (c*Hkv*GS, S) matching row order
        return jnp.repeat(sc.reshape(-1, sc.shape[-1]), GS, axis=0)

    # ---- shared-segment scores: one dot, no head/row waste
    if shared:
        Sp = k_sh.shape[0]
        if quantized:
            big = jax.lax.dot_general(
                q_i8, k_sh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32) * qs
            ssk = rep_heads(sk_sh[None])  # (Hkv*GS, Sp)
            s_sh = big * jnp.concatenate([ssk] * cb, axis=0)
        else:
            s_sh = jax.lax.dot_general(
                qb, k_sh.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        pos_sh = jax.lax.broadcasted_iota(jnp.int32, (N, Sp), 1)
        sh_ok = (pos_sh < sh_hi) & (pos_sh >= sh_lo)
        s_sh = jnp.where(sh_ok, s_sh, NEG_INF)

    # ---- own-segment scores: block-diagonal over row sub-chunks (the only
    # quadratic temp left: (Nc, c2*Sr) with c2 = own_chunk rows)
    c2 = max(1, min(own_chunk, cb))
    while c2 > 1 and (cb % c2 or c2 * Hkv * GS > 256):
        c2 -= 1
    Nc = c2 * Hkv * GS
    qi_all = jax.lax.broadcasted_iota(jnp.int32, (N, Sr), 0) % sq
    pos_ow = jax.lax.broadcasted_iota(jnp.int32, (N, Sr), 1)
    own_ok_all = pos_ow < kv_vec - (sq - 1) + qi_all
    if starts_vec is not None:
        own_ok_all = own_ok_all & (pos_ow >= starts_vec)

    seg = jax.lax.broadcasted_iota(jnp.int32, (Nc, c2 * Sr), 1) // Sr
    qrow_r = jax.lax.broadcasted_iota(jnp.int32, (Nc, c2 * Sr), 0) // (Hkv * GS)
    own2 = seg == qrow_r
    s_own_parts = []
    for ci in range(cb // c2):
        rows = slice(ci * c2, (ci + 1) * c2)
        nrows = slice(ci * Nc, (ci + 1) * Nc)
        kk = k_own[rows].reshape(c2 * Sr, HD)
        if quantized:
            big = jax.lax.dot_general(
                q_i8[nrows], kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = jnp.sum(
                jnp.where(own2, big, 0).reshape(Nc, c2, Sr), axis=1
            ).astype(jnp.float32) * qs[nrows]
            s = s * rep_heads(sk_own[rows])
        else:
            big = jax.lax.dot_general(
                qb[nrows], kk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.sum(jnp.where(own2, big, 0.0).reshape(Nc, c2, Sr), axis=1)
        s_own_parts.append(s)
    s_ow = s_own_parts[0] if len(s_own_parts) == 1 else jnp.concatenate(s_own_parts)
    s_ow = jnp.where(own_ok_all, s_ow, NEG_INF)

    # ---- combined softmax (bounded exp: backend-proof vs fast-math expf)
    m = jnp.max(s_ow, axis=-1, keepdims=True)
    if shared:
        m = jnp.maximum(m, jnp.max(s_sh, axis=-1, keepdims=True))
        p_sh = jnp.where(sh_ok, jnp.exp(jnp.maximum(s_sh - m, -80.0)), 0.0)
    p_ow = jnp.where(own_ok_all, jnp.exp(jnp.maximum(s_ow - m, -80.0)), 0.0)
    denom = jnp.sum(p_ow, -1, keepdims=True)
    if shared:
        denom = denom + jnp.sum(p_sh, -1, keepdims=True)
    denom = jnp.maximum(denom, 1e-30)

    # ---- PV: dots against the full-lane V rows; extract head lanes at the end
    out_parts = []
    for ci in range(cb // c2):
        rows = slice(ci * c2, (ci + 1) * c2)
        nrows = slice(ci * Nc, (ci + 1) * Nc)
        vv = v_own[rows].reshape(c2 * Sr, HD)
        pc = p_ow[nrows]
        if quantized:
            pvq = pc * rep_heads(sv_own[rows])
            ps = jnp.maximum(jnp.max(pvq, axis=-1, keepdims=True), 1e-30) / 127.0
            p_i8 = jnp.clip(jnp.round(pvq / ps), -127, 127).astype(jnp.int8)
            bd = jnp.where(own2, jnp.concatenate([p_i8] * c2, axis=1), 0)
            o = jax.lax.dot_general(
                bd, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ps
        else:
            bd = jnp.where(own2, jnp.concatenate([pc] * c2, axis=1), 0.0)
            o = jax.lax.dot_general(
                bd, vv.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_parts.append(o)
    out = out_parts[0] if len(out_parts) == 1 else jnp.concatenate(out_parts)
    if shared:
        if quantized:
            ssv = jnp.concatenate([rep_heads(sv_sh[None])] * cb, axis=0)
            pv = p_sh * ssv
            ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-30) / 127.0
            p_i8 = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
            out = out + jax.lax.dot_general(
                p_i8, v_sh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ps
        else:
            out = out + jax.lax.dot_general(
                p_sh, v_sh.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # extract each row's head lanes: (N, HD) -> (N, D) via the selection
    # matmul (sum over head slots; non-head lanes already zeroed)
    out = jnp.where(lane_h == row_h, out, 0.0)
    out = (
        jax.lax.dot_general(
            out, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        / denom
    )
    return out.reshape(cb, Hkv, GS, D).astype(out_dtype)


def _shared_kernel_hd(
    li_ref, kv_lens_ref, pm_ref, ss_ref,
    q_ref,  # (Bb, Hkv, GS, D)
    k_ref,  # (1, Bb, Sr, HD)
    v_ref,
    sk_ref,  # (1, 1, Sp, HD) shared keys
    sv_ref,
    *rest,
    scale: float,
    quantized: bool,
    sq: int,
    shared_valid: int,
    row_chunk: int,
    own_chunk: int,
):
    if quantized:
        qk_ref, qv_ref, qsk_ref, qsv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    Bb = k_ref.shape[1]
    GS = q_ref.shape[2]
    cb = max(1, min(row_chunk, Bb))
    while Bb % cb:
        cb -= 1
    Hkv = q_ref.shape[1]
    for ci in range(Bb // cb):
        rows = slice(ci * cb, (ci + 1) * cb)
        kv_vec = jnp.concatenate(
            [
                jnp.full((Hkv * GS, 1), kv_lens_ref[b * Bb + ci * cb + i], jnp.int32)
                for i in range(cb)
            ]
        )
        o_ref[rows] = _hd_attend(
            q_ref[rows], k_ref[0, rows], v_ref[0, rows],
            sk_ref[0, 0], sv_ref[0, 0],
            qk_ref[0, rows].astype(jnp.float32) if quantized else None,
            qv_ref[0, rows].astype(jnp.float32) if quantized else None,
            qsk_ref[0, 0].astype(jnp.float32) if quantized else None,
            qsv_ref[0, 0].astype(jnp.float32) if quantized else None,
            kv_vec, ss_ref[b * Bb], shared_valid,
            scale=scale, sq=sq, own_chunk=own_chunk, out_dtype=o_ref.dtype,
        )


def _plain_kernel_hd(
    li_ref, kv_lens_ref, kv_starts_ref,
    q_ref,  # (Bb, Hkv, GS, D)
    k_ref,  # (1, Bb, S, HD)
    v_ref,
    *rest,
    scale: float,
    quantized: bool,
    sq: int,
    row_chunk: int,
    own_chunk: int,
):
    if quantized:
        qk_ref, qv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)
    Bb = k_ref.shape[1]
    GS = q_ref.shape[2]
    Hkv = q_ref.shape[1]
    S = k_ref.shape[2]
    cb = max(1, min(row_chunk, Bb))
    while Bb % cb:
        cb -= 1
    for ci in range(Bb // cb):
        rows = slice(ci * cb, (ci + 1) * cb)
        kv_vec = jnp.concatenate(
            [
                jnp.full((Hkv * GS, 1), kv_lens_ref[b * Bb + ci * cb + i], jnp.int32)
                for i in range(cb)
            ]
        )
        starts_vec = jnp.concatenate(
            [
                jnp.full((Hkv * GS, 1), kv_starts_ref[b * Bb + ci * cb + i], jnp.int32)
                for i in range(cb)
            ]
        )
        o_ref[rows] = _hd_attend(
            q_ref[rows], k_ref[0, rows], v_ref[0, rows],
            None, None,
            qk_ref[0, rows].astype(jnp.float32) if quantized else None,
            qv_ref[0, rows].astype(jnp.float32) if quantized else None,
            None, None,
            kv_vec, jnp.int32(0), 0,
            scale=scale, sq=sq, own_chunk=own_chunk, out_dtype=o_ref.dtype,
            starts_vec=starts_vec,
        )


def decode_attention_shared_hd(
    q: jnp.ndarray,  # (B, Sq, Hq, D) small query block (Sq <= 8)
    ck: jnp.ndarray,  # (L, B, Sr, HD) own (response) cache
    cv: jnp.ndarray,
    sck: jnp.ndarray,  # (L, B_u, Sp, HD) shared prefix cache (read-only)
    scv: jnp.ndarray,
    layer_idx: jnp.ndarray,
    kv_lens_own: jnp.ndarray,  # (B,) valid own positions incl. current block
    prefix_map: jnp.ndarray,  # (B,) row -> shared-cache row
    shared_valid: int,
    scales: Optional[tuple] = None,  # own (sk, sv) (L, B, Hkv, Sr)
    shared_scales: Optional[tuple] = None,  # (ssk, ssv) (L, B_u, Hkv, Sp)
    scale: Optional[float] = None,
    interpret: bool = False,
    block_b: int = 1,
    row_chunk: Optional[int] = None,
    own_chunk: int = 4,
    shared_starts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Head-dense split-cache decode.  Returns (B, Sq, Hq, D).

    block_b: rows per grid iteration — REQUIRES uniform prefix_map within a
    block (the trainer chunks WM calls so each policy call is one sample's
    rollouts: block_b up to the whole call is legal there; the gt chunk
    uses 1).  row_chunk: rows vectorized per _hd_attend call (default: the
    whole block — shared-segment work is linear in it now).  own_chunk:
    rows per own-segment block-diagonal dot (the only remaining quadratic
    temp; 2-4 keeps it below the shared-segment traffic)."""
    B, Sq, Hq, D = q.shape
    L, _, Sr, HD = ck.shape
    Sp = sck.shape[2]
    Hkv = HD // D
    G = Hq // Hkv
    GS = G * Sq
    if scale is None:
        scale = D**-0.5
    quantized = scales is not None
    Bb = min(block_b, B)
    while B % Bb:
        Bb -= 1
    cb = row_chunk if row_chunk is not None else Bb
    # vectorized query rows per _hd_attend call: temps are (N, Sp|Sr) f32
    # with N = cb*Hkv*G*Sq — cap N so Sq=8 action chunks don't blow VMEM
    while cb > 1 and cb * Hkv * GS > 512:
        cb //= 2

    # (B, Sq, Hq, D) -> (B, Hkv, G*Sq, D) head-major, query position fastest
    qg = (
        jnp.swapaxes(q, 1, 2)
        .reshape(B, Hkv, G, Sq, D)
        .reshape(B, Hkv, GS, D)
    )
    if shared_starts is None:
        shared_starts = jnp.zeros((B,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, Hkv, GS, D), lambda b, li, kl, pm, ss: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, Sr, HD), lambda b, li, kl, pm, ss: (li[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, Sr, HD), lambda b, li, kl, pm, ss: (li[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
            # shared blocks: consecutive b with equal prefix_map revisit the
            # same block -> DMA elided by the pipeline
            pl.BlockSpec(
                (1, 1, Sp, HD),
                lambda b, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Sp, HD),
                lambda b, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec((1, Bb, Hkv, Sr), lambda b, li, kl, pm, ss: (li[0], b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb, Hkv, Sr), lambda b, li, kl, pm, ss: (li[0], b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, Hkv, Sp),
                    lambda b, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, Hkv, Sp),
                    lambda b, li, kl, pm, ss, Bb=Bb: (li[0], pm[b * Bb], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            if quantized
            else []
        ),
        out_specs=pl.BlockSpec(
            (Bb, Hkv, GS, D), lambda b, li, kl, pm, ss: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _shared_kernel_hd, scale=float(scale), quantized=quantized, sq=Sq,
            shared_valid=int(shared_valid), row_chunk=cb, own_chunk=own_chunk,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GS, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Sq * Hq * (Sr + Sp) * D,
            bytes_accessed=2 * B * Sr * HD * jnp.dtype(ck.dtype).itemsize,
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
    out = out.reshape(B, Hkv, G, Sq, D)
    return jnp.swapaxes(out, 1, 3).swapaxes(2, 3).reshape(B, Sq, Hq, D)


def decode_attention_hd(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    ck: jnp.ndarray,  # (L, B, S, HD)
    cv: jnp.ndarray,
    layer_idx: jnp.ndarray,
    kv_lens: jnp.ndarray,  # (B,)
    kv_starts: Optional[jnp.ndarray] = None,
    scales: Optional[tuple] = None,  # (sk, sv) (L, B, Hkv, S)
    scale: Optional[float] = None,
    interpret: bool = False,
    block_b: int = 8,
    row_chunk: Optional[int] = None,
    own_chunk: int = 4,
) -> jnp.ndarray:
    """Head-dense single-cache decode.  Returns (B, Sq, Hq, D)."""
    B, Sq, Hq, D = q.shape
    L, _, S, HD = ck.shape
    Hkv = HD // D
    G = Hq // Hkv
    GS = G * Sq
    if scale is None:
        scale = D**-0.5
    if kv_starts is None:
        kv_starts = jnp.zeros((B,), jnp.int32)
    quantized = scales is not None
    Bb = min(block_b, B)
    while B % Bb:
        Bb -= 1
    cb = row_chunk if row_chunk is not None else Bb
    while cb > 1 and cb * Hkv * GS > 512:
        cb //= 2

    qg = jnp.swapaxes(q, 1, 2).reshape(B, Hkv, G, Sq, D).reshape(B, Hkv, GS, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, Hkv, GS, D), lambda b, li, kl, ks: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, S, HD), lambda b, li, kl, ks: (li[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, S, HD), lambda b, li, kl, ks: (li[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + (
            [
                pl.BlockSpec((1, Bb, Hkv, S), lambda b, li, kl, ks: (li[0], b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb, Hkv, S), lambda b, li, kl, ks: (li[0], b, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            if quantized
            else []
        ),
        out_specs=pl.BlockSpec(
            (Bb, Hkv, GS, D), lambda b, li, kl, ks: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _plain_kernel_hd, scale=float(scale), quantized=quantized, sq=Sq,
            row_chunk=cb, own_chunk=own_chunk,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GS, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Sq * Hq * S * D,
            bytes_accessed=2 * B * S * HD * jnp.dtype(ck.dtype).itemsize,
            transcendentals=B * Sq * Hq * S,
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
    out = out.reshape(B, Hkv, G, Sq, D)
    return jnp.swapaxes(out, 1, 3).swapaxes(2, 3).reshape(B, Sq, Hq, D)
