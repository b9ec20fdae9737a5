"""Fused single-token decode attention owning the KV cache.

Speed-of-light decode step for the WM/LLM rollout loops. The naive XLA path
costs ~2.3x the cache-read floor because the cache update flows through scan
carries as a full-buffer copy. Here the cache is an ALIASED pallas in/out in
HBM (`input_output_aliases`), so per step we do exactly:

  * one surgical DMA writing the new token's K/V row (2*D*2 bytes), and
  * a double-buffered DMA read of only the VALID prefix of the cache
    (ceil(kv_len/block) blocks — the tail past kv_len is never fetched),

with the current token's K/V folded into the softmax in-register (no
read-after-write hazard on the cache row being written).

Replaces vLLM's paged-attention + cache-manager roles
(verl/third_party/vllm/vllm_v_0_6_3).  Layout: cache (L, B, H_kv, S, D).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    li_ref,  # (1,) layer index
    idx_ref,  # (1,) cache write position (= number of tokens already cached)
    kv_starts_ref,  # (B,) first valid position (left padding)
    # inputs
    q_ref,  # VMEM (1, 1, G, D)
    k_new_ref,  # VMEM (1, 1, 1, D)
    v_new_ref,  # VMEM (1, 1, 1, D)
    ck_hbm,  # ANY (L, B, H, S, D) aliased -> out ck
    cv_hbm,  # ANY (L, B, H, S, D) aliased -> out cv
    # outputs
    ck_out,  # aliased with ck_hbm
    cv_out,  # aliased with cv_hbm
    o_ref,  # VMEM (1, 1, G, D)
    # scratch
    k_buf,  # VMEM (2, bk, D)
    v_buf,  # VMEM (2, bk, D)
    kw_buf,  # VMEM (W, D) aligned write window for K
    vw_buf,  # VMEM (W, D) aligned write window for V
    read_sems,  # DMA sems (2, 2)
    write_sems,  # DMA sems (4,)
    *,
    scale: float,
    block_k: int,
    win: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    li = li_ref[0]
    idx = idx_ref[0]  # current token's position; cache[0:idx] are valid history
    kv_start = kv_starts_ref[b]

    # ---- surgical cache write of the new row ----
    # sub-tile writes must be aligned to the dtype's sublane packing (`win`);
    # read-modify-write the aligned window containing row `idx`
    w0 = (idx // win) * win
    rk0 = pltpu.make_async_copy(
        ck_hbm.at[li, b, h, pl.ds(w0, win)], kw_buf, write_sems.at[0]
    )
    rv0 = pltpu.make_async_copy(
        cv_hbm.at[li, b, h, pl.ds(w0, win)], vw_buf, write_sems.at[1]
    )
    rk0.start()
    rv0.start()
    rk0.wait()
    rv0.wait()
    # vectorized row replace (sub-tile dynamic stores are not Mosaic-legal
    # for packed dtypes)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    sel = row_ids == (idx - w0)
    kw_buf[...] = jnp.where(sel, k_new_ref[0, 0].astype(kw_buf.dtype), kw_buf[...])
    vw_buf[...] = jnp.where(sel, v_new_ref[0, 0].astype(vw_buf.dtype), vw_buf[...])
    wk = pltpu.make_async_copy(
        kw_buf, ck_out.at[li, b, h, pl.ds(w0, win)], write_sems.at[2]
    )
    wv = pltpu.make_async_copy(
        vw_buf, cv_out.at[li, b, h, pl.ds(w0, win)], write_sems.at[3]
    )
    wk.start()
    wv.start()

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, D)
    G, D = q.shape
    nb = jax.lax.div(idx + block_k - 1, block_k)  # blocks covering history

    def read(slot, j):
        # NOTE: reads ck_hbm (the input alias) — history rows only (< idx),
        # disjoint from the row being written.
        return (
            pltpu.make_async_copy(
                ck_hbm.at[li, b, h, pl.ds(j * block_k, block_k)],
                k_buf.at[slot],
                read_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                cv_hbm.at[li, b, h, pl.ds(j * block_k, block_k)],
                v_buf.at[slot],
                read_sems.at[slot, 1],
            ),
        )

    @pl.when(nb > 0)
    def _():
        rk, rv = read(0, 0)
        rk.start()
        rv.start()

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nb)
        def _():
            rk, rv = read(1 - slot, j + 1)
            rk.start()
            rv.start()

        rk, rv = read(slot, j)
        rk.wait()
        rv.wait()

        k_blk = k_buf[slot].astype(jnp.float32)  # (bk, D)
        v_blk = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, bk)
        pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (pos < idx) & (pos >= kv_start)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # bounded exp: keeps masked lanes (~-1e30) out of expf (fast-math UB
        # on XLA:CPU interpret runs); exp(-80) == 0 in f32 softmax terms
        p = jnp.where(mask, jnp.exp(jnp.maximum(s - m_new[:, None], -80.0)), 0.0)
        alpha = jnp.exp(jnp.maximum(m - m_new, -80.0))
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m0 = jnp.full((G,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G,), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))

    # ---- fold in the current token (always attended; causal self-hit) ----
    k_cur = k_new_ref[0, 0, 0].astype(jnp.float32)  # (D,)
    v_cur = v_new_ref[0, 0, 0].astype(jnp.float32)
    s_cur = jnp.sum(q * k_cur[None, :], axis=-1)  # (G,)
    m_new = jnp.maximum(m, s_cur)
    p_cur = jnp.exp(jnp.maximum(s_cur - m_new, -80.0))
    alpha = jnp.exp(jnp.maximum(m - m_new, -80.0))
    l = l * alpha + p_cur
    acc = acc * alpha[:, None] + p_cur[:, None] * v_cur[None, :]

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)

    wk.wait()
    wv.wait()


def fused_decode_attention(
    q: jnp.ndarray,  # (B, 1, Hq, D)
    k_new: jnp.ndarray,  # (B, 1, Hkv, D) current token K (post-rope)
    v_new: jnp.ndarray,  # (B, 1, Hkv, D)
    ck: jnp.ndarray,  # (L, B, Hkv, S, D)
    cv: jnp.ndarray,
    layer_idx: jnp.ndarray,
    cache_index: jnp.ndarray,  # scalar: current position (history length)
    kv_starts: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (attn_out (B,1,Hq,D), new_ck, new_cv). ck/cv are donated."""
    B, _, Hq, D = q.shape
    L, _, Hkv, S, _ = ck.shape
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    if kv_starts is None:
        kv_starts = jnp.zeros((B,), jnp.int32)
    block_k = min(block_k, S)
    # full tile height of the cache dtype: f32 -> 8, bf16 -> 16, int8 -> 32
    win = min({4: 8, 2: 16, 1: 32}[jnp.dtype(ck.dtype).itemsize], S)

    qg = q.reshape(B, Hkv, G, D)
    kn = jnp.swapaxes(k_new, 1, 2).reshape(B, Hkv, 1, D)
    vn = jnp.swapaxes(v_new, 1, 2).reshape(B, Hkv, 1, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_k, D), ck.dtype),
            pltpu.VMEM((2, block_k, D), cv.dtype),
            pltpu.VMEM((win, D), ck.dtype),
            pltpu.VMEM((win, D), cv.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    new_ck, new_cv, out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), block_k=block_k, win=win),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        ],
        # scalar-prefetch args shift operand indices by 3: q=3, k_new=4,
        # v_new=5, ck=6, cv=7 -> outputs 0, 1
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(cache_index, jnp.int32).reshape(1),
        kv_starts.astype(jnp.int32),
        qg,
        kn.astype(ck.dtype),
        vn.astype(cv.dtype),
        ck,
        cv,
    )
    return out.reshape(B, 1, Hq, D), new_ck, new_cv
