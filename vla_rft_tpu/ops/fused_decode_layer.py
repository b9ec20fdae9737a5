"""Fused decode-layer matmul kernels for the int8-weight WM rollout path.

The decode loop's non-attention work per layer is ~15 XLA kernel launches
(RMSNorm chain, 3 projections + scale muls, rope, k/v quantization, MLP
chain) — ~0.8ms/step of launch overhead + per-layer weight dynamic-slices
at WM shapes (DESIGN_NOTES round-2 backlog).  These two kernels collapse
that to two pallas_calls per layer:

  fused_rmsnorm_qkv:  x -> rmsnorm -> q/k/v int8 matmuls -> rope(q, k)
                      -> per-(pos, head) int8 quantization of k/v
  fused_o_mlp:        attn -> o_proj -> +residual -> rmsnorm ->
                      gate/up -> silu*mul -> down -> +residual

Both take the nn.scan-STACKED weight arrays (L, in, out) and slice the
layer via a scalar-prefetched layer index in the BlockSpec index map, so
the weight stream is read exactly once per layer step (no XLA-level
dynamic-slice materialization).  Matmul math matches QuantDenseGeneral
bit-for-bit: bf16 activations x int8->bf16 weights, f32 accumulation,
bf16 per-output-channel scales.

WM only (qkv_bias=False, weights_int8=True); the flax path remains the
reference implementation and the fallback everywhere else.
Role parity: vLLM's fused decode-layer CUDA graph work
(reference verl/third_party/vllm engine internals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmsnorm(x, w, eps):
    """Matches models.transformer.RMSNorm: f32 stats, output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _qdot(xn_bf16, w_ref, s_ref):
    """QuantDenseGeneral-parity matmul: bf16 x (int8 -> bf16) with f32 MXU
    accumulation ROUNDED to bf16 (the flax path's dot emits bf16), then the
    bf16 per-output-channel scale — keeps the fused path bit-compatible."""
    y = jax.lax.dot_general(
        xn_bf16, w_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return y * s_ref[0]


def _rope(x, pos, theta, d):
    """NeoX rotary on (N, d) rows with per-row positions (N, 1)."""
    half = d // 2
    freqs = 1.0 / (theta ** (jax.lax.broadcasted_iota(jnp.float32, (1, half), 1) * (2.0 / d)))
    ang = pos.astype(jnp.float32) * freqs  # (N, half)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[:, :half], x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1)


def _qkv_kernel(
    li_ref,  # scalar prefetch: (1,) layer idx
    pos_ref,  # (B, Sq) int32 absolute positions (VMEM input)
    x_ref,  # (B, Sq, H)
    nw_ref,  # (1, H) input_layernorm weight
    wq_ref, sq_ref,  # (1, H, HqD), (1, HqD)
    wk_ref, sk_ref,  # (1, H, KD), (1, KD)
    wv_ref, sv_ref,
    q_ref,  # out (B, Sq, Hq, D) bf16, rope'd
    k8_ref,  # out (B, Sq, KD) int8, rope'd + quantized
    v8_ref,  # out (B, Sq, KD) int8
    ks_ref,  # out (B, Hkv, Sq) bf16 k scales
    vs_ref,  # out (B, Hkv, Sq) bf16
    *,
    eps: float,
    theta: float,
    hq: int,
    hkv: int,
    d: int,
):
    B, Sq, H = x_ref.shape
    N = B * Sq
    xn = _rmsnorm(x_ref[:].reshape(N, H), nw_ref[0], eps)
    q = _qdot(xn, wq_ref, sq_ref)  # (N, Hq*D) bf16
    k = _qdot(xn, wk_ref, sk_ref)  # (N, Hkv*D)
    v = _qdot(xn, wv_ref, sv_ref)

    pos_col = pos_ref[:].reshape(N, 1).astype(jnp.float32)
    # rope is applied per head: operate on (N*h, D) rows, positions repeated
    def rope_heads(t, nh):  # rope computes f32, returns input dtype
        tt = t.reshape(N, nh, d).reshape(N * nh, d)
        pp = jnp.repeat(pos_col, nh, axis=0)
        return _rope(tt, pp, theta, d).astype(t.dtype).reshape(N, nh, d)

    q_r = rope_heads(q, hq)
    k_r = rope_heads(k, hkv)
    q_ref[:] = q_r.reshape(B, Sq, hq, d).astype(q_ref.dtype)

    # per-(pos, head) symmetric int8 quantization (matches Attention.quant)
    def quant(t):  # (N, hkv, d) bf16 -> int8 + bf16 scales
        t = t.astype(jnp.float32)
        a = jnp.max(jnp.abs(t), axis=-1)  # (N, hkv)
        scale = jnp.maximum(a / 127.0, 1e-8)
        q8 = jnp.clip(jnp.round(t / scale[..., None]), -127, 127).astype(jnp.int8)
        return q8, scale.astype(jnp.bfloat16)

    k8, ks = quant(k_r)
    v8, vs = quant(v.reshape(N, hkv, d))
    k8_ref[:] = k8.reshape(B, Sq, hkv * d)
    v8_ref[:] = v8.reshape(B, Sq, hkv * d)
    # scales out as (B, Hkv, Sq) — the cache layout's scale arrangement
    ks_ref[:] = jnp.swapaxes(ks.reshape(B, Sq, hkv), 1, 2)
    vs_ref[:] = jnp.swapaxes(vs.reshape(B, Sq, hkv), 1, 2)


def _o_mlp_kernel(
    li_ref,
    attn_ref,  # (B, Sq, HqD)
    x_ref,  # (B, Sq, H) residual input
    wo_ref, so_ref,  # (1, HqD, H), (1, H)
    nw_ref,  # (1, H) post_attention_layernorm
    wg_ref, sg_ref,  # (1, H, I)
    wu_ref, su_ref,
    wd_ref, sd_ref,  # (1, I, H)
    o_ref,  # out (B, Sq, H) bf16
    *,
    eps: float,
):
    B, Sq, H = x_ref.shape
    N = B * Sq
    h = _qdot(attn_ref[:].reshape(N, -1).astype(jnp.bfloat16), wo_ref, so_ref)
    x1 = x_ref[:].reshape(N, H) + h  # bf16 residual, like DecoderLayer
    xn = _rmsnorm(x1, nw_ref[0], eps)
    g = _qdot(xn, wg_ref, sg_ref)
    u = _qdot(xn, wu_ref, su_ref)
    m = jax.nn.silu(g) * u  # bf16, like MLP
    out = x1 + _qdot(m, wd_ref, sd_ref)
    o_ref[:] = out.reshape(B, Sq, H).astype(o_ref.dtype)


def fused_rmsnorm_qkv(
    x,  # (B, Sq, H) bf16
    positions,  # (B, Sq) int32 absolute positions
    layer_idx,
    norm_w,  # (L, H)
    wq, sq, wk, sk, wv, sv,  # stacked int8 kernels + bf16 scales
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    theta: float,
    interpret: bool = False,
):
    B, Sq, H = x.shape
    L = norm_w.shape[0]
    HqD = num_heads * head_dim
    KD = num_kv_heads * head_dim

    # Mosaic requires the last TWO block dims to divide (8, 128) or equal the
    # array dims — a (1, X) block of an (L, X) array violates the sublane
    # rule.  Lift every per-layer VECTOR to (L, 1, X) so its (1, 1, X) block
    # matches the array's trailing dims exactly; kernels index [0] and get a
    # broadcast-compatible (1, X) slice.
    def _v3(t):
        return t.reshape(t.shape[0], 1, t.shape[-1])

    def _vec_spec(X):
        return pl.BlockSpec(
            (1, 1, X), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, Sq), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sq, H), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(H),
            pl.BlockSpec((1, H, HqD), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(HqD),
            pl.BlockSpec((1, H, KD), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(KD),
            pl.BlockSpec((1, H, KD), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(KD),
        ],
        out_specs=[
            pl.BlockSpec((B, Sq, num_heads, head_dim), lambda i, li: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sq, KD), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sq, KD), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, num_kv_heads, Sq), lambda i, li: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, num_kv_heads, Sq), lambda i, li: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _qkv_kernel, eps=eps, theta=theta, hq=num_heads, hkv=num_kv_heads,
            d=head_dim,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, num_heads, head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, Sq, KD), jnp.int8),
            jax.ShapeDtypeStruct((B, Sq, KD), jnp.int8),
            jax.ShapeDtypeStruct((B, num_kv_heads, Sq), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, num_kv_heads, Sq), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sq * H * (HqD + 2 * KD),
            bytes_accessed=H * (HqD + 2 * KD),
            transcendentals=B * Sq * (num_heads + num_kv_heads) * head_dim,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        x, _v3(norm_w), wq, _v3(sq), wk, _v3(sk), wv, _v3(sv),
    )


def fused_o_mlp(
    attn_out,  # (B, Sq, Hq*D) bf16
    x,  # (B, Sq, H) residual input
    layer_idx,
    wo, so,
    norm_w,  # (L, H) post_attention_layernorm
    wg, sg, wu, su, wd, sd,
    *,
    eps: float,
    interpret: bool = False,
):
    B, Sq, H = x.shape
    HqD = attn_out.shape[-1]
    I = wg.shape[-1]

    def _v3(t):  # (L, X) -> (L, 1, X); see fused_rmsnorm_qkv
        return t.reshape(t.shape[0], 1, t.shape[-1])

    def _vec_spec(X):
        return pl.BlockSpec(
            (1, 1, X), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, Sq, HqD), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sq, H), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HqD, H), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(H),
            _vec_spec(H),
            pl.BlockSpec((1, H, I), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(I),
            pl.BlockSpec((1, H, I), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(I),
            pl.BlockSpec((1, I, H), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM),
            _vec_spec(H),
        ],
        out_specs=pl.BlockSpec((B, Sq, H), lambda i, li: (0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_o_mlp_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Sq, H), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sq * (HqD * H + 3 * H * I),
            bytes_accessed=HqD * H + 3 * H * I,
            transcendentals=B * Sq * I,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        attn_out, x, wo, _v3(so), _v3(norm_w),
        wg, _v3(sg), wu, _v3(su), wd, _v3(sd),
    )
