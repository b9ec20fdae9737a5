"""Vision transformers: SigLIP-so400m + DINOv2-large towers.

Flax replacements for the timm ViTs the reference loads
(prismatic/extern/hf/modeling_prismatic.py:118-142: `timm.create_model` with a
monkey-patched forward returning `get_intermediate_layers(n={num_blocks-2})`,
i.e. the un-normed output after block L-2 with prefix tokens stripped).

This module reproduces exactly that feature tap: `ViT.__call__` runs blocks
0..depth-2 and returns patch tokens only.  Weight converters map timm state
dicts (tools/convert_weights.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1152
    depth: int = 27
    num_heads: int = 16
    mlp_dim: int = 4304
    num_prefix_tokens: int = 0  # cls + register tokens
    class_token: bool = False
    reg_tokens: int = 0
    layerscale: bool = False
    pos_embed_prefix: bool = False  # pos embed covers cls token too (dinov2)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @staticmethod
    def siglip_so400m(**kw) -> "ViTConfig":
        """timm vit_so400m_patch14_siglip_224: 1152d/27L/16H, mlp 4304, no cls."""
        d = dict(
            hidden_size=1152, depth=27, num_heads=16, mlp_dim=4304,
            class_token=False, reg_tokens=0, num_prefix_tokens=0,
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        )
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def dinov2_large_reg4(**kw) -> "ViTConfig":
        """timm vit_large_patch14_reg4_dinov2: 1024d/24L/16H, cls + 4 reg,
        LayerScale; imagenet normalization.  timm defines this model with
        no_embed_class=True (pos embed covers PATCHES ONLY; cls/reg tokens get
        no pos embed — the dinov2 checkpoint's cls pos embed is folded into
        cls_token by timm's _convert_dinov2), hence pos_embed_prefix=False."""
        d = dict(
            hidden_size=1024, depth=24, num_heads=16, mlp_dim=4096,
            class_token=True, reg_tokens=4, num_prefix_tokens=5,
            layerscale=True, pos_embed_prefix=False,
            mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        )
        d.update(kw)
        return ViTConfig(**d)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        D = cfg.hidden_size
        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm1")(x)
        hd = D // cfg.num_heads
        q = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="q")(h)
        k = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="k")(h)
        v = nn.DenseGeneral((cfg.num_heads, hd), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="v")(h)
        o = attention(q, k, v, causal=False, impl="xla")
        o = nn.DenseGeneral(D, axis=(-2, -1), dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj")(o)
        if cfg.layerscale:
            ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5), (D,), cfg.param_dtype)
            o = o * ls1
        x = x + o
        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_fc2")(h)
        if cfg.layerscale:
            ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5), (D,), cfg.param_dtype)
            h = h * ls2
        return x + h


class ViT(nn.Module):
    """Feature extractor: returns patch tokens after block depth-2 (the
    reference's second-to-last-layer tap, modeling_prismatic.py:140)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) already normalized -> (B, num_patches, D)."""
        cfg = self.cfg
        B = images.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(B, -1, cfg.hidden_size)  # (B, N, D)
        n_patches = x.shape[1]

        pos_len = n_patches + (1 if cfg.pos_embed_prefix and cfg.class_token else 0)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, pos_len, cfg.hidden_size),
            cfg.param_dtype,
        )
        prefix = []
        if cfg.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), cfg.param_dtype)
            cls = jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)).astype(x.dtype)
            if cfg.pos_embed_prefix:
                cls = cls + pos[:, :1].astype(x.dtype)
                x = x + pos[:, 1:].astype(x.dtype)
            else:
                x = x + pos.astype(x.dtype)
            prefix.append(cls)
        else:
            x = x + pos.astype(x.dtype)
        if cfg.reg_tokens:
            reg = self.param(
                "reg_tokens", nn.initializers.zeros, (1, cfg.reg_tokens, cfg.hidden_size),
                cfg.param_dtype,
            )
            prefix.append(jnp.broadcast_to(reg, (B, cfg.reg_tokens, cfg.hidden_size)).astype(x.dtype))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)

        # run blocks 0 .. depth-2 (skip the last block — intermediate tap).
        # nn.scan over stacked block params: one compiled block body instead
        # of depth-1 unrolled blocks (compile time on the big towers).
        def body(mdl, h, _):
            return mdl(h), None

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=cfg.depth - 1,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        x, _ = scan(ViTBlock(cfg, name="blocks"), x, None)

        return x[:, cfg.num_prefix_tokens :]  # strip prefix tokens


def normalize_images(images: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """uint8/float [0,1] (B,H,W,3) -> normalized float for this tower.

    Fused into the jitted forward (reference does this on host via torchvision,
    processing_prismatic.py:59-90)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std
