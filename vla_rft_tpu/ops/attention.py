"""Attention: Pallas TPU flash kernels + XLA reference.

TPU-native replacement for flash-attn 2.6 CUDA kernels, which the reference
uses for both the VLM and world-model attention
(train/verl/verl/workers/fsdp_workers.py:274,983 `attn_implementation=
'flash_attention_2'`).

Design (see /opt/skills/guides/pallas_guide.md):
* layout (B, S, H, D); kernels run on (B, H, q-block) grids with K/V for the
  (b, kv-head) resident in VMEM and an online-softmax `fori_loop` over key
  blocks — O(S) memory, MXU matmuls in fp32 accumulation.
* GQA without materializing repeated KV heads: the K/V BlockSpec index map
  divides the query head by the group size.
* padding via per-batch `kv_lens` (SMEM scalars); causality via absolute
  positions with per-batch `q_offset` so chunked decode reuses the kernel.
* backward = recompute-from-(O, lse) with a dq kernel and a dkv kernel
  (classic flash-attention-2 schedule), wired through `jax.custom_vjp`.

The `xla` implementation is the always-available reference (CPU tests,
tiny sequences, single-token decode).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_IMPL_OVERRIDE: list = []


class force_impl:
    """Context manager forcing the 'auto' implementation choice (e.g. 'xla'
    while tracing on CPU for parameter init)."""

    def __init__(self, impl: str):
        self.impl = impl

    def __enter__(self):
        _IMPL_OVERRIDE.append(self.impl)
        return self

    def __exit__(self, *exc):
        _IMPL_OVERRIDE.pop()
        return False


# =============================================================== XLA reference
def _attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool,
    kv_lens: Optional[jnp.ndarray],
    q_offset: Optional[jnp.ndarray],
    scale: float,
    kv_starts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    group = Hq // Hkv
    qh = q.reshape(B, Sq, Hkv, group, D)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qh.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    mask = jnp.ones((B, 1, 1, Sq, Sk), dtype=bool)
    kv_pos = jnp.arange(Sk)[None, :]
    if kv_lens is not None:
        mask = mask & (kv_pos < kv_lens[:, None])[:, None, None, None, :]
    if kv_starts is not None:
        # left padding: keys before kv_starts are invalid
        mask = mask & (kv_pos >= kv_starts[:, None])[:, None, None, None, :]
    if causal:
        q_pos = jnp.arange(Sq)[None, :]
        if q_offset is not None:
            q_pos = q_pos + q_offset[:, None]
        cm = q_pos[:, :, None] >= kv_pos[:, None, :]  # (B, Sq, Sk)
        mask = mask & cm[:, None, None, :, :]
    # Masked softmax with BOUNDED arithmetic everywhere: the classic
    # `softmax(where(mask, s, -1e30))` is mathematically fine but XLA:CPU's
    # fast-math expf miscompiles huge-magnitude inputs at some (B, Sk)
    # vectorization shapes (range-reduction int overflow -> NaN poisoning
    # whole rows; reproduced at B=16, Sk in {512, 768} while eager mode is
    # clean), and -inf fill values are equally UB under fast-math.
    # Construction (autodiff-safe — this path IS differentiated):
    #  * finite fill (-1e4) for the running max, stop_gradient on the shift
    #    (gradient-neutral; avoids the where-max VJP's 0/0 on fully-masked
    #    rows);
    #  * masked lanes get exp(0) — never exp of garbage — then select 0, so
    #    both value and cotangent die exactly;
    #  * any row with a valid lane has sum(e) >= exp(0) == 1, so clamping
    #    the denominator at 0.5 is EXACT for valid rows and keeps
    #    fully-masked rows (p == 0) from scaling cotangents by 1e30.
    m = jax.lax.stop_gradient(
        jnp.max(jnp.where(mask, s, -1e4), axis=-1, keepdims=True)
    )
    e = jnp.where(mask, jnp.exp(jnp.where(mask, s, m) - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 0.5)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, v.astype(jnp.float32))
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


# ============================================================ Pallas fwd kernel
def _fwd_kernel(
    kv_lens_ref,  # SMEM (B,)    per-batch kv length
    q_off_ref,  # SMEM (B,)      per-batch query position offset
    kv_starts_ref,  # SMEM (B,)  per-batch first valid key (left padding)
    q_ref,  # VMEM (1, 1, bq, D)
    k_ref,  # VMEM (1, 1, Sk, D)
    v_ref,  # VMEM (1, 1, Sk, D)
    o_ref,  # VMEM (1, 1, bq, D)
    lse_ref,  # VMEM (1, 1, bq, 1) — trailing lane dim for TPU tiling
    *,
    scale: float,
    causal: bool,
    block_k: int,
    sk: int,
    block_q: int,
):
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, D)
    kv_len = kv_lens_ref[bi]
    kv_start = kv_starts_ref[bi]
    q_pos = (
        qi * block_q
        + q_off_ref[bi]
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    )  # (bq, 1) absolute positions

    nkb = sk // block_k

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        kv_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (kv_pos < kv_len) & (kv_pos >= kv_start)
        if causal:
            mask = mask & (q_pos >= kv_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # bounded exp: masked lanes would feed exp() inputs of ~-1e30, which
        # XLA:CPU fast-math expf miscompiles to NaN at some vector shapes
        # (and interpret-mode runs these kernels through XLA:CPU).  Bound the
        # input (exp(-80) == 0 in f32 softmax terms) and zero masked lanes
        # exactly; fully-masked rows then flow l == 0 -> output 0.
        p = jnp.where(mask, jnp.exp(jnp.maximum(s - m_new[:, None], -80.0)), 0.0)
        alpha = jnp.exp(jnp.maximum(m - m_new, -80.0))
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nkb, body, (acc0, m0, l0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))[:, None]


# ============================================================ Pallas dq kernel
def _dq_kernel(
    kv_lens_ref,
    q_off_ref,
    kv_starts_ref,
    q_ref,  # (1,1,bq,D)
    k_ref,  # (1,1,Sk,D)
    v_ref,  # (1,1,Sk,D)
    do_ref,  # (1,1,bq,D)
    lse_ref,  # (1,1,bq,1)
    delta_ref,  # (1,1,bq,1)
    dq_ref,  # out (1,1,bq,D)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    sk: int,
    block_q: int,
):
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (bq, 1)
    delta = delta_ref[0, 0]  # (bq, 1)
    kv_len = kv_lens_ref[bi]
    kv_start = kv_starts_ref[bi]
    q_pos = (
        qi * block_q
        + q_off_ref[bi]
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    )
    nkb = sk // block_k

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        kv_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (kv_pos < kv_len) & (kv_pos >= kv_start)
        if causal:
            mask = mask & (q_pos >= kv_pos)
        s = jnp.where(mask, s, NEG_INF)
        # bounded exp (see _fwd_kernel): s - lse <= 0 on valid lanes; masked
        # lanes and fully-masked rows (lse == NEG_INF sentinel) select 0
        p = jnp.where(mask, jnp.exp(jnp.maximum(s - lse, -80.0)), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq0 = jnp.zeros_like(q)
    dq = jax.lax.fori_loop(0, nkb, body, dq0)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# =========================================================== Pallas dkv kernel
def _dkv_kernel(
    kv_lens_ref,
    q_off_ref,
    kv_starts_ref,
    q_ref,  # (1,1,G,Sq,D)  all query heads of this kv group
    k_ref,  # (1,1,bk,D)
    v_ref,  # (1,1,bk,D)
    do_ref,  # (1,1,G,Sq,D)
    lse_ref,  # (1,1,G,Sq,1)
    delta_ref,  # (1,1,G,Sq,1)
    dk_ref,  # out (1,1,bk,D)
    dv_ref,  # out (1,1,bk,D)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    sq: int,
    block_k: int,
    group: int,
):
    bi = pl.program_id(0)
    kj = pl.program_id(2)
    k_blk = k_ref[0, 0].astype(jnp.float32)  # (bk, D)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    kv_len = kv_lens_ref[bi]
    kv_start = kv_starts_ref[bi]
    kv_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    nqb = sq // block_q

    d = k_ref.shape[-1]
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)

    def outer(g_dkdv, g):
        dk, dv = g_dkdv

        def body(i, carry):
            dk, dv = carry
            q_blk = q_ref[0, 0, g, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
            do_blk = do_ref[0, 0, g, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
            lse = lse_ref[0, 0, g, pl.ds(i * block_q, block_q), :]  # (bq, 1)
            delta = delta_ref[0, 0, g, pl.ds(i * block_q, block_q), :]
            q_pos = (
                i * block_q
                + q_off_ref[bi]
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            )
            s = (
                jax.lax.dot_general(
                    q_blk,
                    k_blk,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            mask = (kv_pos < kv_len) & (kv_pos >= kv_start)
            if causal:
                mask = mask & (q_pos >= kv_pos)
            s = jnp.where(mask, s, NEG_INF)
            p = jnp.where(mask, jnp.exp(jnp.maximum(s - lse, -80.0)), 0.0)
            dv_new = dv + jax.lax.dot_general(
                p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do_blk,
                v_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta) * scale
            dk_new = dk + jax.lax.dot_general(
                ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return dk_new, dv_new

        return jax.lax.fori_loop(0, nqb, body, (dk, dv))

    dk, dv = dk0, dv0
    for g in range(group):  # static unroll over the GQA group
        dk, dv = outer((dk, dv), g)

    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ================================================================= host wrapper
def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def _flash(q, k, v, kv_lens, q_offset, kv_starts, causal, scale, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(
        q, k, v, kv_lens, q_offset, kv_starts, causal, scale, block_q, block_k, interpret
    )
    return out


def _flash_fwd_impl(q, k, v, kv_lens, q_offset, kv_starts, causal, scale, block_q, block_k, interpret):
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    sq_p = _round_up(Sq, block_q)
    sk_p = _round_up(Sk, block_k)
    qt = _pad_to(jnp.swapaxes(q, 1, 2), sq_p, 2)  # (B, Hq, Sq', D)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), sk_p, 2)  # (B, Hkv, Sk', D)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), sk_p, 2)
    group = Hq // Hkv

    grid = (B, Hq, sq_p // block_q)
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        block_k=block_k,
        sk=sk_p,
        block_q=block_q,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, sk_p, D),
                lambda b, h, i: (b, h // group, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sk_p, D),
                lambda b, h, i: (b, h // group, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, sq_p, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * sq_p * sk_p * D,
            bytes_accessed=2 * B * (Hq * sq_p + 2 * Hkv * sk_p) * D,
            transcendentals=B * Hq * sq_p * sk_p,
        ),
    )(kv_lens.astype(jnp.int32), q_offset.astype(jnp.int32), kv_starts.astype(jnp.int32), qt, kt, vt)
    out_final = jnp.swapaxes(out[:, :, :Sq], 1, 2)
    return out_final, (out, lse, qt, kt, vt)


def _flash_fwd_vjp(q, k, v, kv_lens, q_offset, kv_starts, causal, scale, block_q, block_k, interpret):
    out_final, (out, lse, qt, kt, vt) = _flash_fwd_impl(
        q, k, v, kv_lens, q_offset, kv_starts, causal, scale, block_q, block_k, interpret
    )
    res = (qt, kt, vt, out, lse, kv_lens, q_offset, kv_starts, q.shape, k.shape)
    return out_final, res


def _flash_bwd_vjp(causal, scale, block_q, block_k, interpret, res, g):
    qt, kt, vt, out, lse, kv_lens, q_offset, kv_starts, q_shape, k_shape = res
    B, Sq, Hq, D = q_shape
    _, Sk, Hkv, _ = k_shape
    sq_p = qt.shape[2]
    sk_p = kt.shape[2]
    group = Hq // Hkv

    dot = _pad_to(jnp.swapaxes(g, 1, 2), sq_p, 2)  # (B, Hq, Sq', D)
    delta = jnp.sum(dot.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta[..., None]  # (B, Hq, Sq', 1) — lane dim for TPU tiling

    kv_lens_i = kv_lens.astype(jnp.int32)
    q_off_i = q_offset.astype(jnp.int32)
    kv_starts_i = kv_starts.astype(jnp.int32)

    # ---- dq ----
    dq_kernel = functools.partial(
        _dq_kernel, scale=scale, causal=causal, block_k=block_k, sk=sk_p, block_q=block_q
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, Hq, sq_p // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p, D), lambda b, h, i: (b, h // group, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p, D), lambda b, h, i: (b, h // group, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, sq_p, D), qt.dtype),
        interpret=interpret,
    )(kv_lens_i, q_off_i, kv_starts_i, qt, kt, vt, dot, lse, delta)

    # ---- dk, dv ----
    q5 = qt.reshape(B, Hkv, group, sq_p, D)
    do5 = dot.reshape(B, Hkv, group, sq_p, D)
    lse5 = lse.reshape(B, Hkv, group, sq_p, 1)
    delta5 = delta.reshape(B, Hkv, group, sq_p, 1)

    dkv_kernel = functools.partial(
        _dkv_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        sq=sq_p,
        block_k=block_k,
        group=group,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hkv, sk_p // block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, group, sq_p, D), lambda b, h, j: (b, h, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group, sq_p, D), lambda b, h, j: (b, h, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group, sq_p, 1), lambda b, h, j: (b, h, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group, sq_p, 1), lambda b, h, j: (b, h, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, sk_p, D), kt.dtype),
            jax.ShapeDtypeStruct((B, Hkv, sk_p, D), vt.dtype),
        ],
        interpret=interpret,
    )(kv_lens_i, q_off_i, kv_starts_i, q5, kt, vt, do5, lse5, delta5)

    dq_f = jnp.swapaxes(dq[:, :, :Sq], 1, 2)
    dk_f = jnp.swapaxes(dk[:, :, :Sk], 1, 2)
    dv_f = jnp.swapaxes(dv[:, :, :Sk], 1, 2)
    return dq_f, dk_f, dv_f, None, None, None


_flash.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


# ==================================================================== frontend
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,
    q_offset: Optional[jnp.ndarray] = None,
    kv_starts: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention.

    Args:
      q: (B, Sq, Hq, D); k, v: (B, Sk, Hkv, D) with Hq % Hkv == 0.
      causal: causal masking on absolute positions.
      kv_lens: (B,) valid key counts (right padding masked out).
      q_offset: (B,) absolute position of q[0] (for chunked decode).
      kv_starts: (B,) first valid key index (left padding masked out).
      impl: 'auto' | 'xla' | 'pallas'.
    """
    B, Sq, Hq, D = q.shape
    if scale is None:
        scale = D**-0.5
    if impl == "auto" and _IMPL_OVERRIDE:
        impl = _IMPL_OVERRIDE[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        # pallas path needs MXU-friendly sizes to win; tiny Sq (decode) -> xla
        impl = "pallas" if (on_tpu and Sq >= 32) else "xla"
    if impl == "xla":
        return _attention_xla(q, k, v, causal, kv_lens, q_offset, scale, kv_starts)
    Sk = k.shape[1]
    if kv_lens is None:
        kv_lens = jnp.full((B,), Sk, jnp.int32)
    if q_offset is None:
        # standard self-attention: q position == absolute index
        q_offset = jnp.zeros((B,), jnp.int32)
    if kv_starts is None:
        kv_starts = jnp.zeros((B,), jnp.int32)
    return _flash(
        q, k, v, kv_lens, q_offset, kv_starts, causal, float(scale), block_q, block_k, interpret
    )
