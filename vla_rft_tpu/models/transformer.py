"""Decoder-only transformer core (LLaMA / Qwen2 family).

One flax module covers both LLM backbones of the reference:

* the world model — a from-scratch HF LLaMA, 24L/1024h/16 heads, vocab 9008
  (reference: train/verl/ivideogpt/configs/llama.json;
  run_vla_rft.sh:56 sets vocab_size=9008 for the ctx_msp token space);
* the policy backbone — Qwen2.5-0.5B ("minivla",
  prismatic/extern/hf/configuration_prismatic.py:57): GQA 14/2 heads with
  qkv bias, tied embeddings.

It also stands in for the reference's Megatron tensor-parallel llama/qwen2
re-implementations (verl/models/llama/megatron/modeling_llama_megatron.py):
tensor parallelism here is a sharding annotation on the same module, not a
separate model.

TPU-first choices: Pallas flash attention (ops/attention.py), `nn.scan` over
layers (one compiled layer body), static-shape KV cache updated with
`lax.dynamic_update_slice` for `lax.scan` decode loops (replacing the
reference's vLLM engine, verl/third_party/vllm/vllm_v_0_6_3/llm.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = False
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192
    dtype: Any = jnp.bfloat16  # compute dtype
    param_dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
    # 'bf16' | 'int8' — int8 halves decode-attention HBM traffic (per-token
    # per-head symmetric scales); logprob training paths use full forwards,
    # so quantization only perturbs rollout sampling, not PPO math
    kv_cache_dtype: str = "bf16"
    # Ulysses sequence parallelism: name of the mesh axis the sequence dim is
    # sharded over. Only used under shard_map (full forward, no cache); the
    # all-to-all swaps seq<->heads around attention (ulysses.py parity).
    ulysses_axis: Optional[str] = None
    # batch rows vectorized per iteration of the split-cache decode kernel.
    # ONLY safe when every block_b consecutive rows share a prefix_map entry
    # (the GRPO rollout groups the n rollouts of a sample contiguously, so
    # any value dividing n works). 1 = one row per iteration.
    decode_block_b: int = 1
    # int8 per-output-channel weights for every matmul (QuantDenseGeneral):
    # halves the decode loop's weight reads. Params must come from
    # quantize_decoder_params; meant for a FROZEN rollout model (the WM) —
    # training paths keep bf16.
    weights_int8: bool = False
    # KV cache layout:
    #   'heads': (L, B, Hkv, S, D) with head-PAIR packing when D*2 <= 128
    #            (round-1 layout; ops/decode_attention.py kernels);
    #   'hd':    (L, B, S, Hkv*D) — every position's heads contiguous on the
    #            lane dim (ops/decode_attention_hd.py kernels).  Removes the
    #            write-path transpose + pair packing, makes shared-prefix
    #            scoring head-waste-free, and cuts the decode kernel's
    #            block-diagonal VPU temps ~Hkv/own_chunk x (see module
    #            docstring there).  Requires Hkv*D % 128 == 0.
    kv_layout: str = "hd"

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def kv_layout_eff(self) -> str:
        """'hd' needs the lane dim (Hkv*D) 128-aligned; otherwise fall back
        to the head-blocked layout."""
        if self.kv_layout == "hd" and (self.num_kv_heads * self.hd) % 128 == 0:
            return "hd"
        return "heads"

    @property
    def pack_kv(self) -> bool:
        """Pack head PAIRS into the KV cache's trailing dim ('heads' layout
        only). TPU HBM tiles the last dim to 128 lanes; a (S, 64) cache row
        is stored (and DMA'd!) as (S, 128) — 2x the memory and 2x the decode
        bandwidth. Packing two heads per 128-lane row removes the padding
        entirely."""
        if self.kv_layout_eff == "hd":
            return False
        return self.num_kv_heads % 2 == 0 and self.hd * 2 <= 128

    @staticmethod
    def wm_llama(vocab_size: int = 9008, **kw) -> "TransformerConfig":
        """ivideogpt/configs/llama.json with the run's vocab override."""
        d = dict(
            vocab_size=vocab_size,
            hidden_size=1024,
            intermediate_size=4096,
            num_layers=24,
            num_heads=16,
            num_kv_heads=16,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
            qkv_bias=False,
            tie_word_embeddings=False,
        )
        d.update(kw)
        return TransformerConfig(**d)

    @staticmethod
    def wm_llama_small(vocab_size: int = 4633, **kw) -> "TransformerConfig":
        d = dict(
            vocab_size=vocab_size,
            hidden_size=768,
            intermediate_size=3072,
            num_layers=12,
            num_heads=12,
            num_kv_heads=12,
        )
        d.update(kw)
        return TransformerConfig(**d)

    @staticmethod
    def qwen25_0_5b(**kw) -> "TransformerConfig":
        d = dict(
            vocab_size=151936,
            hidden_size=896,
            intermediate_size=4864,
            num_layers=24,
            num_heads=14,
            num_kv_heads=2,
            rope_theta=1_000_000.0,
            rms_norm_eps=1e-6,
            qkv_bias=True,
            tie_word_embeddings=True,
            max_position_embeddings=32768,
        )
        d.update(kw)
        return TransformerConfig(**d)


def pack_kv_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, S, D) -> (..., H//2, S, 2D): pair (2h, 2h+1) shares a row,
    head 2h in lanes [:D], head 2h+1 in lanes [D:]."""
    *lead, H, S, D = x.shape
    x = x.reshape(*lead, H // 2, 2, S, D)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, H // 2, S, 2 * D)


def unpack_kv_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_kv_heads."""
    *lead, H2, S, D2 = x.shape
    x = x.reshape(*lead, H2, S, 2, D2 // 2)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, H2 * 2, S, D2 // 2)


# ------------------------------------------------------------------ building blocks
class QuantDenseGeneral(nn.Module):
    """DenseGeneral with an int8 per-output-channel kernel (+bf16 scales).

    Decode is weight-read-bound (0.84GB/step bf16 at WM sizes); int8 halves
    the reads and the convert(int8->bf16) feeds the MXU directly (fused by
    XLA), so the dequant multiply rides the tiny activation instead of the
    weight.  Used when TransformerConfig.weights_int8 — the WM is FROZEN in
    RFT, so quantization happens once at setup (quantize_decoder_params),
    not per step.  Param layout: kernel (in_total, out_total) int8, scale
    (out_total,) bf16, bias (features...) optional."""

    features: Tuple[int, ...]
    axis: Tuple[int, ...] = (-1,)
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import numpy as _npmod

        feats = self.features
        n_contract = len(self.axis)
        in_total = int(_npmod.prod(x.shape[-n_contract:]))
        out_total = int(_npmod.prod(feats))
        kernel = self.param(
            "kernel", nn.initializers.zeros, (in_total, out_total), jnp.int8
        )
        scale = self.param("scale", nn.initializers.ones, (out_total,), jnp.bfloat16)
        lead = x.shape[: x.ndim - n_contract]
        y = jax.lax.dot_general(
            x.reshape(*lead, in_total).astype(self.dtype),
            kernel.astype(self.dtype),
            (((len(lead),), (0,)), ((), ())),
        )
        y = y * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (out_total,), jnp.bfloat16)
            y = y + bias.astype(self.dtype)
        return y.reshape(*lead, *feats)


def quantize_decoder_params(params, cfg: "TransformerConfig"):
    """bf16 Decoder params -> the int8 tree a weights_int8 Decoder expects.

    Per-output-channel symmetric quantization of every matmul kernel
    (attention projections re-flattened to 2D); norms/embedding stay as-is.
    """
    import numpy as np

    p = params["params"] if "params" in params else params

    def quant2d(w):
        w = np.asarray(jax.device_get(w), np.float32)
        w2 = w.reshape(w.shape[0], -1)
        s = np.maximum(np.abs(w2).max(axis=0) / 127.0, 1e-10)
        q = np.clip(np.round(w2 / s), -127, 127).astype(np.int8)
        return q, s.astype(np.float32)

    L = cfg.num_layers
    nh, nkv, hd, D = cfg.num_heads, cfg.num_kv_heads, cfg.hd, cfg.hidden_size
    layers = p["layers"]
    attn, mlp = layers["self_attn"], layers["mlp"]

    def quant_stacked(node, reshape):
        """node['kernel']: (L, ...) -> per-layer 2D quantization."""
        ks, ss = [], []
        for i in range(L):
            q, s = quant2d(reshape(np.asarray(jax.device_get(node["kernel"][i]), np.float32)))
            ks.append(q)
            ss.append(s)
        out = {
            "kernel": jnp.asarray(np.stack(ks)),
            "scale": jnp.asarray(np.stack(ss), jnp.bfloat16),
        }
        if "bias" in node:
            b = np.asarray(jax.device_get(node["bias"]), np.float32)
            out["bias"] = jnp.asarray(b.reshape(L, -1), jnp.bfloat16)
        return out

    new_layers = {
        "input_layernorm": layers["input_layernorm"],
        "post_attention_layernorm": layers["post_attention_layernorm"],
        "self_attn": {
            "q_proj": quant_stacked(attn["q_proj"], lambda w: w.reshape(D, nh * hd)),
            "k_proj": quant_stacked(attn["k_proj"], lambda w: w.reshape(D, nkv * hd)),
            "v_proj": quant_stacked(attn["v_proj"], lambda w: w.reshape(D, nkv * hd)),
            "o_proj": quant_stacked(attn["o_proj"], lambda w: w.reshape(nh * hd, D)),
        },
        "mlp": {
            name: quant_stacked(mlp[name], lambda w: w) for name in ("gate_proj", "up_proj", "down_proj")
        },
    }
    out = {"embed_tokens": p["embed_tokens"], "layers": new_layers, "norm": p["norm"]}
    if "lm_head" in p:
        q, s = quant2d(p["lm_head"]["kernel"])
        out["lm_head"] = {"kernel": jnp.asarray(q), "scale": jnp.asarray(s, jnp.bfloat16)}
    return {"params": out}


def make_dense(cfg: "TransformerConfig", feats, name: str, *, axis=(-1,), bias=False):
    """The decoder's matmul: QuantDenseGeneral when cfg.weights_int8, else a
    plain DenseGeneral — ONE switch point so the two param layouts stay in
    sync (kernel (in, out) int8 + scale vs DenseGeneral kernels)."""
    if cfg.weights_int8:
        f = feats if isinstance(feats, tuple) else (feats,)
        return QuantDenseGeneral(f, axis=tuple(axis), use_bias=bias, dtype=cfg.dtype, name=name)
    return nn.DenseGeneral(
        feats, axis=axis if len(axis) > 1 else -1, use_bias=bias,
        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name,
    )


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        return (x * w.astype(jnp.float32)).astype(dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """NeoX-style rotary embedding. x: (B, S, H, D), positions: (B, S)."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class Attention(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self, x, positions, kv_lens, cache=None, cache_index=None, causal=True,
        layer_idx=None, kv_starts=None, shared_cache=None, shared_len=0,
        prefix_map=None, shared_starts=None,
    ):
        """cache: FULL stacked (ck, cv) of shape (L, B, S, nkv, hd), updated
        in place at `layer_idx` via dynamic_update_slice so lax.scan keeps one
        buffer alive across the decode loop (a per-layer ys-stacked cache
        would copy the whole multi-GB cache every token).

        shared_cache: optional READ-ONLY prefix cache (L, B_u, nkv, Sp, hd)
        holding the first `shared_len` positions, shared by many batch rows
        (`prefix_map` (B,) -> B_u).  `cache` then covers only positions >=
        shared_len and `cache_index` stays ABSOLUTE — writes land at
        cache_index - shared_len.  Deduplicates the prompt's KV across the n
        GRPO rollouts of a sample (decode is cache-read-bound; the prompt is
        ~2/3 of the positions at LIBERO shapes)."""
        cfg = self.cfg
        hd, nh, nkv = cfg.hd, cfg.num_heads, cfg.num_kv_heads
        dense = lambda feats, name, bias: make_dense(cfg, feats, name, bias=bias)
        B, S, _ = x.shape
        q = dense((nh, hd), "q_proj", cfg.qkv_bias)(x)
        k = dense((nkv, hd), "k_proj", cfg.qkv_bias)(x)
        v = dense((nkv, hd), "v_proj", cfg.qkv_bias)(x)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        new_cache = None
        if cache is not None:
            int8_cache = cfg.kv_cache_dtype == "int8"
            if int8_cache:
                ck, cv, sk, sv = cache  # int8 values + (L,B,nkv,S) f32 scales
            else:
                ck, cv = cache  # (L, B, nkv, S, hd) — (S, hd) tiled
            li = jnp.asarray(layer_idx, jnp.int32)
            idx = jnp.asarray(cache_index, jnp.int32)
            if shared_cache is not None:
                idx = idx - shared_len  # own-cache write coordinates
            # (B,) per-row write offsets (speculative decode: rows advance at
            # different rates) -> vmapped DUS (lowers to a scatter of B rows)
            per_row_idx = idx.ndim == 1

            def dus5(c, new):  # c (L,B,H,S,D), new (1,B,H,Sq,D)
                if not per_row_idx:
                    return jax.lax.dynamic_update_slice(c, new, (li, 0, 0, idx, 0))
                return jax.vmap(
                    lambda cb, nb, ib: jax.lax.dynamic_update_slice(
                        cb, nb[None], (li, 0, ib, 0)
                    ),
                    in_axes=(1, 0, 0), out_axes=1,
                )(c, new[0], idx)

            def dus4(c, new):  # c (L,B,H,S), new (1,B,H,Sq)
                if not per_row_idx:
                    return jax.lax.dynamic_update_slice(c, new, (li, 0, 0, idx))
                return jax.vmap(
                    lambda cb, nb, ib: jax.lax.dynamic_update_slice(
                        cb, nb[None], (li, 0, ib)
                    ),
                    in_axes=(1, 0, 0), out_axes=1,
                )(c, new[0], idx)

            def dus_hd(c, new):  # c (L,B,S,HD), new (1,B,Sq,HD): contiguous rows
                if not per_row_idx:
                    return jax.lax.dynamic_update_slice(c, new, (li, 0, idx, 0))
                return jax.vmap(
                    lambda cb, nb, ib: jax.lax.dynamic_update_slice(
                        cb, nb[None], (li, ib, 0)
                    ),
                    in_axes=(1, 0, 0), out_axes=1,
                )(c, new[0], idx)

            from vla_rft_tpu.ops.attention import _IMPL_OVERRIDE

            impl = cfg.attn_impl
            if impl == "auto" and _IMPL_OVERRIDE:
                impl = _IMPL_OVERRIDE[-1]
            on_tpu = jax.default_backend() not in ("cpu", "gpu")

            use_hd = cfg.kv_layout_eff == "hd"
            packed = cfg.pack_kv  # head pairs share a 128-lane cache row
            if use_hd:
                # head-dense rows: the projection output (B, S, nkv, hd) is
                # ALREADY position-major — reshaping is free (the 'heads'
                # layout pays a swapaxes transpose every write)
                k_t = k.reshape(B, S, nkv * hd)[None]  # (1, B, S, HD)
                v_t = v.reshape(B, S, nkv * hd)[None]
            else:
                k_t = jnp.swapaxes(k, 1, 2)[None]  # (1, B, nkv, S, hd)
                v_t = jnp.swapaxes(v, 1, 2)[None]
            if int8_cache:
                def quant(x, axis=-1):
                    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
                    scale = jnp.maximum(a / 127.0, 1e-8)
                    qv = jnp.clip(
                        jnp.round(
                            x.astype(jnp.float32) / jnp.expand_dims(scale, axis)
                        ), -127, 127,
                    ).astype(jnp.int8)
                    # bf16 scales halve the per-step scale reads; 0.4% relative
                    # error on a 1/127-grained quantizer is noise
                    return qv, scale.astype(jnp.bfloat16)

                if use_hd:
                    # quantize per (pos, head) on the natural layout, then
                    # flatten heads into lanes; scales stay (1, B, nkv, S)
                    kq4, ks_new = quant(k[None])  # (1,B,S,nkv,hd) -> (1,B,S,nkv)
                    vq4, vs_new = quant(v[None])
                    ck = dus_hd(ck, kq4.reshape(1, B, S, nkv * hd))
                    cv = dus_hd(cv, vq4.reshape(1, B, S, nkv * hd))
                    sk = dus4(sk, jnp.swapaxes(ks_new, 2, 3))
                    sv = dus4(sv, jnp.swapaxes(vs_new, 2, 3))
                else:
                    kq, ks_new = quant(k_t)  # scales per (pos, head), unpacked
                    vq, vs_new = quant(v_t)
                    if packed:
                        kq, vq = pack_kv_heads(kq), pack_kv_heads(vq)
                    ck = dus5(ck, kq)
                    cv = dus5(cv, vq)
                    sk = dus4(sk, ks_new)
                    sv = dus4(sv, vs_new)
                new_cache = (ck, cv, sk, sv)
            else:
                if use_hd:
                    ck = dus_hd(ck, k_t.astype(ck.dtype))
                    cv = dus_hd(cv, v_t.astype(cv.dtype))
                else:
                    kw, vw = (
                        (k_t, v_t) if not packed
                        else (pack_kv_heads(k_t), pack_kv_heads(v_t))
                    )
                    ck = dus5(ck, kw.astype(ck.dtype))
                    cv = dus5(cv, vw.astype(cv.dtype))
                new_cache = (ck, cv)
            kv_lens_eff = jnp.minimum(kv_lens, cache_index + S)

            # Multi-token decode chunks (speculative verify) are pallas-
            # eligible only at Mosaic-validated alignments: query rows
            # (Hkv*G*S) on the 8-sublane grid and the hd cache's seq dim on
            # the 128-lane grid.  Off-grid shapes (e.g. the push preset's
            # Hkv=4, sq=3, Sr=288 f32 cache) hit a Mosaic layout-inference
            # bug: silently WRONG output at block_b=1 (rel err 3.4e-3 vs
            # 1e-7 interpret) and 'infer-vector-layout: unsupported shape
            # cast' at block_b=8 (tools/hd_spec_repro.py, r5).  Production
            # LIBERO shapes (Hkv=16, int8 128-aligned cache) stay on the
            # kernel; everything else falls back to the XLA attend path.
            def _chunk_aligned(seq_len):
                return S == 1 or (
                    (nkv * (cfg.num_heads // nkv) * S) % 8 == 0
                    and seq_len % 128 == 0
                )

            if shared_cache is not None:
                if int8_cache:
                    sck, scv, ssk, ssv = shared_cache
                else:
                    sck, scv = shared_cache
                own_lens = kv_lens_eff - shared_len
                _own_seq = ck.shape[2] if use_hd else ck.shape[3]
                if (
                    S <= 8 and impl in ("auto", "pallas") and on_tpu
                    and _chunk_aligned(_own_seq)
                ):
                    if use_hd:
                        from vla_rft_tpu.ops.decode_attention_hd import (
                            decode_attention_shared_hd,
                        )

                        out = decode_attention_shared_hd(
                            q, ck, cv, sck, scv, li, own_lens, prefix_map,
                            shared_valid=shared_len,
                            scales=(sk, sv) if int8_cache else None,
                            shared_scales=(ssk, ssv) if int8_cache else None,
                            block_b=cfg.decode_block_b,
                            shared_starts=shared_starts,
                        )
                    else:
                        from vla_rft_tpu.ops.decode_attention import (
                            decode_attention_shared,
                        )

                        out = decode_attention_shared(
                            q, ck, cv, sck, scv, li, own_lens, prefix_map,
                            shared_valid=shared_len,
                            scales=(sk, sv) if int8_cache else None,
                            shared_scales=(ssk, ssv) if int8_cache else None,
                            block_b=cfg.decode_block_b,
                            shared_starts=shared_starts,
                        )
                else:
                    # XLA fallback (CPU tests / large S): gather each row's
                    # shared prefix, concat with the own cache, regular
                    # masked attention over the combined sequence
                    def take_layer(a):
                        return jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)

                    if use_hd:
                        # (B, S, HD) -> (B, H, S, D) view for the concat below
                        as_heads = lambda a: jnp.swapaxes(
                            a.reshape(a.shape[0], a.shape[1], nkv, hd), 1, 2
                        )
                        k_sh, v_sh = as_heads(take_layer(sck)), as_heads(take_layer(scv))
                        k_ow, v_ow = as_heads(take_layer(ck)), as_heads(take_layer(cv))
                    else:
                        k_sh, v_sh = take_layer(sck), take_layer(scv)
                        k_ow, v_ow = take_layer(ck), take_layer(cv)
                        if packed:
                            k_sh, v_sh = unpack_kv_heads(k_sh), unpack_kv_heads(v_sh)
                            k_ow, v_ow = unpack_kv_heads(k_ow), unpack_kv_heads(v_ow)
                    if int8_cache:
                        deq = lambda a, s: (
                            a.astype(jnp.float32) * s.astype(jnp.float32)[..., None]
                        ).astype(cfg.dtype)
                        k_sh = deq(k_sh, take_layer(ssk))
                        v_sh = deq(v_sh, take_layer(ssv))
                        k_ow = deq(k_ow, take_layer(sk))
                        v_ow = deq(v_ow, take_layer(sv))
                    k_sh = jnp.take(k_sh, prefix_map, axis=0)[:, :, :shared_len]
                    v_sh = jnp.take(v_sh, prefix_map, axis=0)[:, :, :shared_len]
                    k_all = jnp.swapaxes(
                        jnp.concatenate([k_sh, k_ow], axis=2), 1, 2
                    ).astype(cfg.dtype)
                    v_all = jnp.swapaxes(
                        jnp.concatenate([v_sh, v_ow], axis=2), 1, 2
                    ).astype(cfg.dtype)
                    q_offset = jnp.broadcast_to(
                        jnp.asarray(cache_index, jnp.int32), (B,)
                    )
                    out = attention(
                        q, k_all, v_all, causal=causal, kv_lens=kv_lens_eff,
                        q_offset=q_offset, kv_starts=shared_starts, impl="xla",
                    )
            elif (
                (S <= 8 if use_hd else S == 1)
                and impl in ("auto", "pallas") and on_tpu
                and _chunk_aligned(ck.shape[2] if use_hd else ck.shape[3])
            ):
                # small-query decode: pallas kernel slices the layer out of
                # the stacked cache via its index map
                scales = (sk, sv) if int8_cache else None
                if use_hd:
                    from vla_rft_tpu.ops.decode_attention_hd import (
                        decode_attention_hd,
                    )

                    out = decode_attention_hd(
                        q, ck, cv, li, kv_lens_eff, kv_starts, scales=scales,
                        block_b=cfg.decode_block_b,
                    )
                else:
                    from vla_rft_tpu.ops.decode_attention import decode_attention

                    out = decode_attention(
                        q, ck, cv, li, kv_lens_eff, kv_starts, scales=scales
                    )
            else:
                k_l = jax.lax.dynamic_index_in_dim(ck, li, axis=0, keepdims=False)
                v_l = jax.lax.dynamic_index_in_dim(cv, li, axis=0, keepdims=False)
                if use_hd:
                    k_all = k_l.reshape(B, k_l.shape[1], nkv, hd)
                    v_all = v_l.reshape(B, v_l.shape[1], nkv, hd)
                else:
                    if packed:
                        k_l, v_l = unpack_kv_heads(k_l), unpack_kv_heads(v_l)
                    k_all = jnp.swapaxes(k_l, 1, 2)
                    v_all = jnp.swapaxes(v_l, 1, 2)
                if int8_cache:
                    sk_l = jnp.swapaxes(
                        jax.lax.dynamic_index_in_dim(sk, li, axis=0, keepdims=False), 1, 2
                    )  # (B, S, nkv)
                    sv_l = jnp.swapaxes(
                        jax.lax.dynamic_index_in_dim(sv, li, axis=0, keepdims=False), 1, 2
                    )
                    k_all = (k_all.astype(jnp.float32) * sk_l[..., None]).astype(cfg.dtype)
                    v_all = (v_all.astype(jnp.float32) * sv_l[..., None]).astype(cfg.dtype)
                q_offset = jnp.broadcast_to(
                    jnp.asarray(cache_index, jnp.int32), (B,)
                )
                out = attention(
                    q, k_all, v_all, causal=causal, kv_lens=kv_lens_eff,
                    q_offset=q_offset, kv_starts=kv_starts,
                    impl="xla" if S < 32 else cfg.attn_impl,
                )
        elif cfg.ulysses_axis is not None:
            # sequence-parallel full forward: all-to-all seq<->heads around
            # attention; q/k/v carry GLOBAL positions (rope applied before)
            from vla_rft_tpu.parallel.ulysses import (
                all_to_all_head2seq,
                all_to_all_seq2head,
                repeat_kv_heads,
            )

            sp = jax.lax.psum(1, cfg.ulysses_axis)
            k_sp = repeat_kv_heads(k, sp)
            v_sp = repeat_kv_heads(v, sp)
            qh = all_to_all_seq2head(q, cfg.ulysses_axis)
            kh = all_to_all_seq2head(k_sp, cfg.ulysses_axis)
            vh = all_to_all_seq2head(v_sp, cfg.ulysses_axis)
            out = attention(
                qh, kh, vh, causal=causal, kv_lens=kv_lens, kv_starts=kv_starts,
                impl=cfg.attn_impl,
            )
            out = all_to_all_head2seq(out, cfg.ulysses_axis)
        else:
            out = attention(
                q, k, v, causal=causal, kv_lens=kv_lens, kv_starts=kv_starts,
                impl=cfg.attn_impl,
            )
        out = make_dense(cfg, cfg.hidden_size, "o_proj", axis=(-2, -1))(out)
        return out, new_cache


class MLP(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = lambda f, name: make_dense(cfg, f, name)
        gate = d(cfg.intermediate_size, "gate_proj")(x)
        up = d(cfg.intermediate_size, "up_proj")(x)
        return d(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class DecoderLayer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self, x, positions, kv_lens, cache=None, cache_index=None, causal=True,
        layer_idx=None, kv_starts=None, shared_cache=None, shared_len=0,
        prefix_map=None, shared_starts=None,
    ):
        cfg = self.cfg
        h, new_cache = Attention(cfg, name="self_attn")(
            RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="input_layernorm")(x),
            positions, kv_lens, cache, cache_index, causal, layer_idx, kv_starts,
            shared_cache, shared_len, prefix_map, shared_starts,
        )
        x = x + h
        x = x + MLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="post_attention_layernorm")(x)
        )
        return x, new_cache


class Decoder(nn.Module):
    """LLaMA/Qwen2-style causal decoder with optional KV cache.

    Call conventions:
      * full forward: (input_ids | inputs_embeds), kv_lens -> logits, hidden
      * prefill:      pass empty cache (init_cache) and cache_index=0
      * decode step:  pass current cache and cache_index=<tokens so far>
    """

    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        kv_lens: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        cache: Optional[Dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        causal: bool = True,
        compute_logits: bool = True,
        embed_only: bool = False,
        logits_last_only: bool = False,
        kv_starts: Optional[jnp.ndarray] = None,
        shared_cache: Optional[Tuple] = None,
        shared_len: int = 0,
        prefix_map: Optional[jnp.ndarray] = None,
        shared_starts: Optional[jnp.ndarray] = None,
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[Dict]]:
        cfg = self.cfg
        embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="embed_tokens",
        )
        if embed_only:
            return embed(input_ids)
        if inputs_embeds is None:
            inputs_embeds = embed(input_ids)
        B, S, _ = inputs_embeds.shape
        if positions is None:
            base = jnp.arange(S, dtype=jnp.int32)[None, :]
            off = 0
            if cache_index is not None:
                off = jnp.asarray(cache_index, jnp.int32)
                if off.ndim == 1:  # per-row offsets (speculative decode)
                    off = off[:, None]
            positions = jnp.broadcast_to(base + off, (B, S))
        if kv_lens is None:
            if cache is None:
                kv_lens = jnp.full((B,), S, jnp.int32)
            else:
                # uniform-length decode: everything up to cache_index + S is valid
                kv_lens = jnp.broadcast_to(
                    jnp.asarray(cache_index + S, jnp.int32), (B,)
                )
        x = inputs_embeds

        layer_cls = DecoderLayer
        if cfg.remat:
            # static: causal (6) and shared_len (10); self counts as 0
            layer_cls = nn.remat(DecoderLayer, static_argnums=(6, 10))

        # The full stacked KV cache rides the layer-scan CARRY and is updated
        # in place per layer — not emitted as stacked ys, which would allocate
        # and copy the entire cache every call (fatal in decode loops).
        def body(mdl, carry, _):
            h, pos, layer_cache, li = carry
            h, new_cache = mdl(
                h, pos, kv_lens, layer_cache, cache_index, causal, li, kv_starts,
                shared_cache, shared_len, prefix_map, shared_starts,
            )
            return (h, pos, new_cache, li + 1), None

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=cfg.num_layers,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        carry, _ = scan(
            layer_cls(cfg, name="layers"),
            (x, positions, cache, jnp.asarray(0, jnp.int32)),
            None,
        )
        x, _, new_layer_caches, _ = carry
        x = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="norm")(x)

        logits = None
        if compute_logits:
            # prefill only needs the next-token logits: slice before the
            # O(S*V) matmul (saves ~1.3GB fp32 at WM prompt shapes)
            xl = x[:, -1:] if logits_last_only else x
            if cfg.tie_word_embeddings:
                logits = embed.attend(xl.astype(cfg.dtype))
            else:
                logits = make_dense(cfg, cfg.vocab_size, "lm_head")(xl)
            logits = logits.astype(jnp.float32)
        return logits, x, new_layer_caches

    def init_cache(self, batch_size: int, max_len: int, dtype=None) -> Dict:
        cfg = self.cfg
        dtype = dtype or cfg.dtype
        # int8 scale arrays put S on the lane dim (needs 128); bf16 caches
        # only need sublane tiling (8) — don't waste bandwidth on padding
        align = 128 if cfg.kv_cache_dtype == "int8" else 8
        max_len = (max_len + align - 1) // align * align
        nkv, hd = cfg.num_kv_heads, cfg.hd
        if cfg.kv_layout_eff == "hd":
            shape = (cfg.num_layers, batch_size, max_len, nkv * hd)
        else:
            if cfg.pack_kv:  # head pairs share a 128-lane row (no lane padding)
                nkv, hd = nkv // 2, hd * 2
            shape = (cfg.num_layers, batch_size, nkv, max_len, hd)
        if cfg.kv_cache_dtype == "int8":
            sshape = (cfg.num_layers, batch_size, cfg.num_kv_heads, max_len)
            return (
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.bfloat16),
                jnp.ones(sshape, jnp.bfloat16),
            )
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def cache_seq_axes(self) -> Tuple[int, ...]:
        """Per-arm axis index of the sequence dim, matching init_cache's
        tuple order — for callers that grow/slice caches (wm_rollout)."""
        cfg = self.cfg
        kv_ax = 2 if cfg.kv_layout_eff == "hd" else 3
        if cfg.kv_cache_dtype == "int8":
            return (kv_ax, kv_ax, 3, 3)
        return (kv_ax, kv_ax)


def decode_step_fused(
    wm: "Decoder",
    params,
    input_ids: jnp.ndarray,  # (B, Sq) token ids, Sq <= 8
    cache: Tuple,
    cache_index,  # scalar int32 (per-row offsets NOT supported: flax path)
    kv_lens: Optional[jnp.ndarray] = None,
    shared_cache: Optional[Tuple] = None,
    shared_len: int = 0,
    prefix_map: Optional[jnp.ndarray] = None,
    shared_starts: Optional[jnp.ndarray] = None,
    logits_last_only: bool = False,
    interpret: bool = False,
):
    """Flax-free fused decode step for the int8-weight WM rollout.

    Same (logits, hidden=None, new_cache) contract as Decoder.__call__ on
    the decode path, but the per-layer work runs as THREE pallas calls
    (fused_rmsnorm_qkv -> decode attention -> fused_o_mlp) over the
    nn.scan-stacked param tree, instead of ~15 XLA kernel launches.  The
    flax path stays the reference implementation (tests pin parity) and
    handles everything this fast path gates out: bf16 caches, per-row
    cache offsets (speculative decode), qkv_bias models, prefill.
    """
    from vla_rft_tpu.ops.decode_attention_hd import (
        decode_attention_hd,
        decode_attention_shared_hd,
    )
    from vla_rft_tpu.ops.fused_decode_layer import (
        fused_o_mlp,
        fused_rmsnorm_qkv,
        rope_tables,
    )

    cfg = wm.cfg
    assert cfg.weights_int8 and cfg.kv_layout_eff == "hd" and not cfg.qkv_bias
    assert cfg.kv_cache_dtype == "int8"
    p = params["params"] if "params" in params else params
    layers = p["layers"]
    attnp, mlpp = layers["self_attn"], layers["mlp"]
    B, S = input_ids.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    x = jnp.take(p["embed_tokens"]["embedding"], input_ids, axis=0).astype(cfg.dtype)
    idx = jnp.asarray(cache_index, jnp.int32)
    positions = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[None] + idx, (B, S)
    )
    if kv_lens is None:
        kv_lens = jnp.broadcast_to(idx + S, (B,))
    kv_lens_eff = jnp.minimum(kv_lens, idx + S)
    own_idx = idx - shared_len if shared_cache is not None else idx
    ss = shared_starts
    if shared_cache is not None and ss is None:
        ss = jnp.zeros((B,), jnp.int32)
    # trig is layer-invariant: one XLA computation per decode step
    rope_cos, rope_sins = rope_tables(positions, cfg.rope_theta, nh, hd)

    def body(carry, _):
        x, (ck, cv, skc, svc), li = carry
        q, k8, v8, ks, vs = fused_rmsnorm_qkv(
            x, rope_cos, rope_sins, li,
            layers["input_layernorm"]["weight"],
            attnp["q_proj"]["kernel"], attnp["q_proj"]["scale"],
            attnp["k_proj"]["kernel"], attnp["k_proj"]["scale"],
            attnp["v_proj"]["kernel"], attnp["v_proj"]["scale"],
            num_heads=nh, num_kv_heads=nkv, head_dim=hd,
            eps=cfg.rms_norm_eps, interpret=interpret,
        )
        q = q.reshape(B, S, nh, hd)  # kernel emits head-dense (B, S, Hq*D)
        ck = jax.lax.dynamic_update_slice(ck, k8[None], (li, 0, own_idx, 0))
        cv = jax.lax.dynamic_update_slice(cv, v8[None], (li, 0, own_idx, 0))
        skc = jax.lax.dynamic_update_slice(skc, ks[None], (li, 0, 0, own_idx))
        svc = jax.lax.dynamic_update_slice(svc, vs[None], (li, 0, 0, own_idx))
        if shared_cache is not None:
            sck, scv, ssk, ssv = shared_cache
            attn = decode_attention_shared_hd(
                q, ck, cv, sck, scv, li, kv_lens_eff - shared_len, prefix_map,
                shared_valid=shared_len, scales=(skc, svc),
                shared_scales=(ssk, ssv), block_b=cfg.decode_block_b,
                shared_starts=ss, interpret=interpret,
            )
        else:
            attn = decode_attention_hd(
                q, ck, cv, li, kv_lens_eff, scales=(skc, svc),
                block_b=cfg.decode_block_b, interpret=interpret,
            )
        x = fused_o_mlp(
            attn.reshape(B, S, nh * hd), x, li,
            attnp["o_proj"]["kernel"], attnp["o_proj"]["scale"],
            layers["post_attention_layernorm"]["weight"],
            mlpp["gate_proj"]["kernel"], mlpp["gate_proj"]["scale"],
            mlpp["up_proj"]["kernel"], mlpp["up_proj"]["scale"],
            mlpp["down_proj"]["kernel"], mlpp["down_proj"]["scale"],
            eps=cfg.rms_norm_eps, interpret=interpret,
        )
        return (x, (ck, cv, skc, svc), li + 1), None

    (x, new_cache, _), _ = jax.lax.scan(
        body, (x, tuple(cache), jnp.asarray(0, jnp.int32)), None,
        length=cfg.num_layers,
    )

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = (
        xf * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        * p["norm"]["weight"].astype(jnp.float32)
    ).astype(cfg.dtype)
    xl = xn[:, -1:] if logits_last_only else xn
    # QuantDenseGeneral parity: bf16 dot output, bf16 scale, then f32
    logits = jax.lax.dot_general(
        xl.astype(jnp.bfloat16),
        p["lm_head"]["kernel"].astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16) * p["lm_head"]["scale"]
    return logits.astype(jnp.float32), xn, new_cache
