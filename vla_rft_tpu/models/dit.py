"""Action-expert DiT: DiT_SingleTokenAction_OneCtx.

Flax port of the reference DiT
(prismatic/models/diffusion_transformer.py:203-568): adaLN-Zero blocks over
the 8 action tokens, sinusoidal TimestepEmbedder, cross-attention into the
VLM hidden-state context every `ctx_every` blocks (plus first/last), final
adaLN layer, fixed sincos temporal embedding.

Configured as the run uses it: depth 8, hidden 512, 8 heads, ctx_every 2,
in_channels = ACTION_DIM * llm_dim = 7*896 (action_heads.py:177-202,
noise_net.py:22-54).

Dropout in the reference (attn_drop/cross dropout 0.1) is active only in
torch train() mode; we default to deterministic compute — the PPO ratio then
compares like with like between rollout and update.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int
    out_channels: int = 7
    hidden_size: int = 512
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_actions: int = 8
    ctx_every: int = 2
    llm_dim: int = 896
    freq_dim: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


def sincos_temp_embed(length: int, dim: int) -> np.ndarray:
    """get_1d_sincos_temp_embed (diffusion_transformer.py:495-546)."""
    pos = np.arange(length, dtype=np.float64)
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def timestep_frequency_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """TimestepEmbedder.timestep_embedding (diffusion_transformer.py:111-130):
    [cos | sin] halves. t: (B,) float."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedder(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = timestep_frequency_embedding(t, cfg.freq_dim)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(h)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class SelfAttention(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, N, C = x.shape
        hd = cfg.hidden_size // cfg.num_heads
        qkv = nn.Dense(3 * C, use_bias=True, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, cfg.num_heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (hd**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)
        return nn.Dense(C, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj")(o)


class CrossAttention(nn.Module):
    """transformer_utils.py CrossAttentionBlock/CrossAttention: pre-LN on both
    streams, separate q(v_proj)/k(l_proj)/v(values_l_proj) heads, out proj,
    LayerScale gamma_v (init 1e-4) residual."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, ctx):
        cfg = self.cfg
        B, N, C = x.shape
        hd = cfg.hidden_size // cfg.num_heads
        xv = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="layer_norm_v")(x)
        cl = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="layer_norm_l")(ctx)
        q = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="v_proj")(xv)
        k = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="l_proj")(cl)
        v = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="values_l_proj")(cl)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (hd**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        o = nn.DenseGeneral(C, axis=(-2, -1), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="out_v_proj")(o)
        gamma = self.param("gamma_v", nn.initializers.constant(1e-4), (C,), cfg.param_dtype)
        return x + gamma.astype(o.dtype) * o


class DiTBlock(nn.Module):
    cfg: DiTConfig
    use_cross: bool

    @nn.compact
    def __call__(self, x, c, ctx):
        cfg = self.cfg
        mod = nn.Dense(
            6 * cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(nn.silu(c))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm1")(x)
        h = SelfAttention(cfg, name="attn_temporal")(_modulate(h, sh_msa, sc_msa))
        x = x + g_msa[:, None, :] * h
        if self.use_cross:
            x = CrossAttention(cfg, name="cross_attn")(x, ctx)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm3")(x)
        h = _modulate(h, sh_mlp, sc_mlp)
        h = nn.Dense(int(cfg.hidden_size * cfg.mlp_ratio), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_fc2")(h)
        return x + g_mlp[:, None, :] * h


class DiTSingleTokenActionOneCtx(nn.Module):
    """diffusion_transformer.py:340-487 forward semantics with a single
    broadcast context layer."""

    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, num_actions, in_channels)
        timesteps: jnp.ndarray,  # (B,) float in [0,1]
        context: jnp.ndarray,  # (B, S_ctx, llm_dim)
        proprio: jnp.ndarray,  # (B, llm_dim) already projected to llm space
    ) -> jnp.ndarray:
        cfg = self.cfg
        B = x.shape[0]

        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="x_embedder")(
            x.astype(cfg.dtype)
        )
        temp = jnp.asarray(sincos_temp_embed(cfg.num_actions, cfg.hidden_size))
        x = x + temp[None].astype(x.dtype)

        t_emb = TimestepEmbedder(cfg, name="t_embedder")(timesteps)  # (B, H)
        p_emb = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proprio_embedder")(
            proprio.astype(cfg.dtype)
        )
        ctx = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="context_adapter")(
            context.astype(cfg.dtype)
        )  # (B, S, H)
        # single context layer broadcast across blocks -> per-layer cond equal
        c = p_emb + t_emb + jnp.mean(ctx, axis=1)  # (B, H)

        for i in range(cfg.depth):
            use_cross = (i % cfg.ctx_every == 0) or (i == cfg.depth - 1) or (i == 0)
            x = DiTBlock(cfg, use_cross, name=f"blocks_{i}")(x, c, ctx)

        # final adaLN layer, zero-init output (diffusion_transformer.py:182-199)
        mod = nn.Dense(
            2 * cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_adaLN",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_final")(x)
        h = _modulate(h, shift, scale)
        out = nn.Dense(
            cfg.out_channels, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_linear",
        )(h)
        return out  # (B, num_actions, out_channels)
