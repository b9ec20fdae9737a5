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


def _v3(t):
    """(L, X) -> (L, 1, X).  Mosaic requires the last TWO block dims to
    divide (8, 128) or equal the array dims — a (1, X) block of an (L, X)
    array violates the sublane rule.  Lifting per-layer VECTORS to
    (L, 1, X) makes their (1, 1, X) block match the array's trailing dims
    exactly; kernels index [0] and get a broadcast-compatible (1, X)."""
    return t.reshape(t.shape[0], 1, t.shape[-1])


def _vec_spec(X):
    """BlockSpec for a _v3-lifted per-layer vector: (1, 1, X) at layer li."""
    return pl.BlockSpec(
        (1, 1, X), lambda i, li: (li[0], 0, 0), memory_space=pltpu.VMEM
    )


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


def _rope_dense(t_bf16, cos, sins, half):
    """NeoX rotary directly on head-dense (N, nh*d) rows.

    Mosaic rejects the lane-split reshape (N, nh*d) -> (N, nh, d)
    ("infer-vector-layout: unsupported shape cast"), so the per-head
    formulation is unusable in-kernel.  Dense equivalent: each lane's
    rotation partner sits at lane l ^ (d/2) (the within-head half swap),
    extracted by ONE MXU dot against a constant 0/1 permutation matrix —
    exact for bf16 inputs (f32 accumulation of one product).  cos / sins
    are precomputed per lane OUTSIDE the kernel (sins carries the NeoX
    sign: -sin on the first half of each head, +sin on the second), so
    out = t*cos + partner*sins  ==  [x1*cos - x2*sin, x2*cos + x1*sin]
    bit-for-bit (IEEE sign-flip and a+(-c)==a-c exactness).
    """
    width = t_bf16.shape[-1]
    ai = jax.lax.broadcasted_iota(jnp.int32, (width, width), 0)
    bi = jax.lax.broadcasted_iota(jnp.int32, (width, width), 1)
    perm = (bi == (ai ^ half)).astype(jnp.bfloat16)
    partner = jax.lax.dot_general(
        t_bf16, perm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return t_bf16.astype(jnp.float32) * cos + partner * sins


def _quant_T(tf, nh, d, B, Sq):
    """Per-(pos, head) symmetric int8 quant of head-dense (N, nh*d) f32 rows.

    The per-head amax needs a lane-GROUP reduction, which Mosaic can't
    express on the dense layout (lane-split reshape unsupported); in the
    TRANSPOSED layout (nh*d, N) the head groups live on sublanes, where
    the (nh, d, N) split and axis-1 max are supported.  Math matches
    models.transformer.Attention.quant bit-for-bit (same f32 values, max
    is order-exact).  Returns (q8 (B, Sq, nh*d) int8, scales (B, nh, Sq)
    bf16 — the cache layout's scale arrangement).
    """
    N = B * Sq
    t3 = tf.T.reshape(nh, d, N)
    a = jnp.max(jnp.abs(t3), axis=1)  # (nh, N)
    sc = jnp.maximum(a / 127.0, 1e-8)
    q3 = jnp.clip(jnp.round(t3 / sc[:, None, :]), -127, 127)
    q8 = q3.reshape(nh * d, N).T.astype(jnp.int8).reshape(B, Sq, nh * d)
    # bf16 cast LAST: a bf16 relayout mid-chain (cast before the swapaxes)
    # crashes the Mosaic compiler at Sq∈{1,7} shapes
    scb = jnp.swapaxes(sc.T.reshape(B, Sq, nh), 1, 2).astype(jnp.bfloat16)
    return q8, scb


def _qkv_kernel(
    li_ref,  # scalar prefetch: (1,) layer idx
    cos_ref,  # (N, HqD) f32 per-lane cos (layer-invariant, computed outside)
    sins_ref,  # (N, HqD) f32 per-lane signed sin
    x_ref,  # (B, Sq, H)
    nw_ref,  # (1, 1, H) input_layernorm weight (_v3-lifted; [0] -> (1, H))
    wq_ref, sq_ref,  # (1, H, HqD), (1, 1, HqD)
    wk_ref, sk_ref,  # (1, H, KD), (1, 1, KD)
    wv_ref, sv_ref,
    q_ref,  # out (B, Sq, HqD) bf16, rope'd, head-dense
    k8_ref,  # out (B, Sq, KD) int8, rope'd + quantized
    v8_ref,  # out (B, Sq, KD) int8
    ks_ref,  # out (B, Hkv, Sq) bf16 k scales
    vs_ref,  # out (B, Hkv, Sq) bf16
    *,
    eps: float,
    hq: int,
    hkv: int,
    d: int,
):
    B, Sq, H = x_ref.shape
    N = B * Sq
    KD = hkv * d
    half = d // 2
    xn = _rmsnorm(x_ref[:].reshape(N, H), nw_ref[0], eps)
    q = _qdot(xn, wq_ref, sq_ref)  # (N, Hq*D) bf16
    k = _qdot(xn, wk_ref, sk_ref)  # (N, Hkv*D)
    v = _qdot(xn, wv_ref, sv_ref)

    cos = cos_ref[:]
    sins = sins_ref[:]
    q_r = _rope_dense(q, cos, sins, half)
    # cos/sins tile with period d, so the k slice is just the first KD lanes
    k_r = _rope_dense(k, cos[:, :KD], sins[:, :KD], half)
    q_ref[:] = q_r.astype(jnp.bfloat16).reshape(B, Sq, hq * d)

    # flax parity: rope returns bf16 (x.dtype); quant then upcasts to f32
    k8, ks = _quant_T(k_r.astype(jnp.bfloat16).astype(jnp.float32), hkv, d, B, Sq)
    v8, vs = _quant_T(v.astype(jnp.float32), hkv, d, B, Sq)
    k8_ref[:] = k8
    v8_ref[:] = v8
    ks_ref[:] = ks
    vs_ref[:] = vs


def _o_mlp_kernel(
    li_ref,
    attn_ref,  # (B, Sq, HqD)
    x_ref,  # (B, Sq, H) residual input
    wo_ref, so_ref,  # (1, HqD, H), (1, 1, H) (_v3-lifted; [0] -> (1, H))
    nw_ref,  # (1, 1, H) post_attention_layernorm (_v3-lifted)
    wg_ref, sg_ref,  # (1, H, I), (1, 1, I)
    wu_ref, su_ref,
    wd_ref, sd_ref,  # (1, I, H), (1, 1, H)
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
    # silu like MLP (bf16 sigmoid rounding, bf16 multiply) — but sigmoid is
    # evaluated in f32: Mosaic rejects jax.nn.silu on bf16 vectors
    # ('vector.broadcast' element-type verification error)
    m = g * jax.nn.sigmoid(g.astype(jnp.float32)).astype(jnp.bfloat16) * u
    out = x1 + _qdot(m, wd_ref, sd_ref)
    o_ref[:] = out.reshape(B, Sq, H).astype(o_ref.dtype)


def rope_tables(positions, theta, num_heads, head_dim):
    """Per-lane (N, Hq*D) f32 cos / signed-sin tables for _rope_dense.

    Layer-invariant — compute ONCE per decode step, outside the layer scan.
    Uses the exact freqs expression of models.transformer.rope so the trig
    values are the same XLA subgraph (bit-equal with the flax path)."""
    B, Sq = positions.shape
    N = B * Sq
    d = head_dim
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.reshape(N, 1).astype(jnp.float32) * freqs  # (N, d/2)
    cos_h, sin_h = jnp.cos(ang), jnp.sin(ang)
    cos = jnp.tile(jnp.concatenate([cos_h, cos_h], axis=-1), (1, num_heads))
    sins = jnp.tile(jnp.concatenate([-sin_h, sin_h], axis=-1), (1, num_heads))
    return cos, sins


def fused_rmsnorm_qkv(
    x,  # (B, Sq, H) bf16
    rope_cos,  # (B*Sq, Hq*D) f32 from rope_tables (layer-invariant)
    rope_sins,
    layer_idx,
    norm_w,  # (L, H)
    wq, sq, wk, sk, wv, sv,  # stacked int8 kernels + bf16 scales
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    interpret: bool = False,
):
    B, Sq, H = x.shape
    L = norm_w.shape[0]
    HqD = num_heads * head_dim
    KD = num_kv_heads * head_dim
    N = B * Sq

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((N, HqD), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, HqD), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
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
            pl.BlockSpec((B, Sq, HqD), lambda i, li: (0, 0, 0),
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
            _qkv_kernel, eps=eps, hq=num_heads, hkv=num_kv_heads, d=head_dim,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HqD), jnp.bfloat16),
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
            transcendentals=0,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        rope_cos, rope_sins,
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
