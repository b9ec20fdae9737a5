"""Convolutional VAE building blocks (flax, NHWC).

Flax ports of the diffusers blocks the reference's visual tokenizers are
assembled from (train/verl/ivideogpt/ctx_tokenizer/vae.py:47-371,
conditional_vae.py:10-215, tokenizer/vae.py CNNEncoder/CNNDecoder):
ResnetBlock2D, DownEncoderBlock2D, UpDecoderBlock2D, UNetMidBlock2D with a
single-head spatial attention, plus the cross-frame CrossAttentionBlock2D
used by the conditional (context-compressive) encoder/decoder.

NHWC layout throughout — TPU convolutions want channels-last; converters from
torch checkpoints transpose NCHW weights.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1", dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm2", dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SpatialAttention(nn.Module):
    """diffusers Attention in UNetMidBlock2D: GN -> 1-head attention over HW -> residual."""

    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="group_norm", dtype=self.dtype)(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        s = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (C**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(h.dtype)
        o = jnp.einsum("bqk,bkc->bqc", p, v)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(B, H, W, C)


class Downsample(nn.Module):
    """stride-2 conv with diffusers' asymmetric (0,1,0,1) padding."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # exact-2x nearest upsample as repeat (broadcast+reshape) — the
        # jax.image.resize gather lowering is slow at 256^2 on TPU
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.groups, dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 3  # diffusers uses layers_per_block + 1 in decoders
    add_upsample: bool = True
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.groups, dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNetMidBlock(nn.Module):
    groups: int = 32
    add_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = ResnetBlock(ch, self.groups, dtype=self.dtype, name="resnets_0")(x)
        if self.add_attention:
            x = SpatialAttention(self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock(ch, self.groups, dtype=self.dtype, name="resnets_1")(x)
        return x


class CrossAttentionBlock2D(nn.Module):
    """Cross-frame attention fusing context features into the dynamics path
    (conditional_vae.py:10-55): GN on q/kv, learned positional embeddings,
    4-head attention, residual + silu."""

    channels: int
    resolution: int
    num_heads: int = 4
    groups: int = 32
    kv_frames: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, addin):
        # z: (B, H, W, C); addin: (B, H, W, C) context features (kv_frames=1)
        B, H, W, C = z.shape
        # torch nn.GroupNorm default eps is 1e-5 (conditional_vae.py:26-27),
        # unlike the diffusers blocks' explicit 1e-6
        kv = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="kv_norm", dtype=self.dtype)(addin).reshape(B, -1, C)
        kv_pos = self.param(
            "kv_pos_emb", nn.initializers.zeros,
            (self.kv_frames * self.resolution * self.resolution, C), jnp.float32,
        )
        kv = kv + kv_pos.astype(kv.dtype)
        q = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="q_norm", dtype=self.dtype)(z).reshape(B, -1, C)
        q_pos = self.param(
            "q_pos_emb", nn.initializers.zeros,
            (self.resolution * self.resolution, C), jnp.float32,
        )
        q = q + q_pos.astype(q.dtype)

        hd = C // self.num_heads
        qh = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype, name="q_proj")(q)
        kh = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype, name="k_proj")(kv)
        vh = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype, name="v_proj")(kv)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * (hd**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(qh.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
        o = nn.DenseGeneral(C, axis=(-2, -1), dtype=self.dtype, name="out_proj")(o)
        return nn.silu(z + o.reshape(B, H, W, C))


class Encoder(nn.Module):
    """ctx_tokenizer/vae.py Encoder: conv_in -> down blocks -> mid -> GN/silu/conv_out.
    Returns (latent, features) where features = [post-conv_in, each down block, mid]."""

    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    double_z: bool = False
    add_mid_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        feats: List[jnp.ndarray] = []
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        feats.append(x)
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == len(self.block_out_channels) - 1
            x = DownEncoderBlock(
                ch, self.layers_per_block, add_downsample=not is_final,
                groups=self.groups, dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
            feats.append(x)
        x = UNetMidBlock(self.groups, self.add_mid_attention, dtype=self.dtype, name="mid_block")(x)
        feats.append(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        out_ch = 2 * self.out_channels if self.double_z else self.out_channels
        x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        if return_features:
            return x, feats
        return x


class Decoder(nn.Module):
    """ctx_tokenizer/vae.py Decoder. Returns (rgb, features) where features =
    [post-conv_in, mid, each up block] (matching the torch forward order)."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    add_mid_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, return_features: bool = False):
        feats: List[jnp.ndarray] = []
        rev = list(reversed(self.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        feats.append(x)
        x = UNetMidBlock(self.groups, self.add_mid_attention, dtype=self.dtype, name="mid_block")(x)
        feats.append(x)
        for i, ch in enumerate(rev):
            is_final = i == len(rev) - 1
            x = UpDecoderBlock(
                ch, self.layers_per_block + 1, add_upsample=not is_final,
                groups=self.groups, dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
            feats.append(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        if return_features:
            return x, feats
        return x


class ConditionalEncoder(nn.Module):
    """conditional_vae.py ConditionalEncoder: a plain Encoder whose down path
    cross-attends into the context encoder's features at resolutions <=
    max_att_resolution."""

    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    max_att_resolution: int = 32
    init_resolution: int = 256
    add_mid_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond_features: List[jnp.ndarray]):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        resolution = self.init_resolution
        att_idx = 0
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == len(self.block_out_channels) - 1
            x = DownEncoderBlock(
                ch, self.layers_per_block, add_downsample=not is_final,
                groups=self.groups, dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
            if not is_final:
                resolution //= 2
            if x.shape[1] <= self.max_att_resolution:
                x = CrossAttentionBlock2D(
                    ch, x.shape[1], groups=self.groups, dtype=self.dtype,
                    name=f"cross_att_blocks_{att_idx}",
                )(x, cond_features[i + 1])
                att_idx += 1
        x = UNetMidBlock(self.groups, self.add_mid_attention, dtype=self.dtype, name="mid_block")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class ConditionalDecoder(nn.Module):
    """conditional_vae.py ConditionalDecoder: Decoder whose up path cross-attends
    into the context decoder's features."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    max_att_resolution: int = 32
    init_resolution: int = 32
    add_mid_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, cond_features: List[jnp.ndarray]):
        rev = list(reversed(self.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = UNetMidBlock(self.groups, self.add_mid_attention, dtype=self.dtype, name="mid_block")(x)
        x = CrossAttentionBlock2D(
            rev[0], x.shape[1], groups=self.groups, dtype=self.dtype, name="cross_att_blocks_0"
        )(x, cond_features[1])
        att_idx = 1
        for i, ch in enumerate(rev):
            is_final = i == len(rev) - 1
            x = UpDecoderBlock(
                ch, self.layers_per_block + 1, add_upsample=not is_final,
                groups=self.groups, dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
            if x.shape[1] <= self.max_att_resolution:
                x = CrossAttentionBlock2D(
                    ch, x.shape[1], groups=self.groups, dtype=self.dtype,
                    name=f"cross_att_blocks_{att_idx}",
                )(x, cond_features[i + 2])
                att_idx += 1
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x
