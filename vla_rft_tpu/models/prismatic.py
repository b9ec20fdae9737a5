"""OpenVLA / Prismatic VLM (policy model).

Flax re-implementation of the reference's policy
(prismatic/extern/hf/modeling_prismatic.py):

* PrismaticVisionBackbone (:70-231): fused DINOv2-large + SigLIP-so400m
  towers over a channel-stacked 6-channel image (dino = channels 0:3,
  siglip = 3:6), features concatenated on the hidden dim -> (B, 256, 2176).
* PrismaticProjector (:234-266): fused MLP 2176 -> 4*2176 -> 896 -> 896.
* PrismaticForConditionalGeneration 'v1' semantics (:588-707): action-token
  embeddings replaced by 64 learned `action_queries` (:642-651), vision
  patches inserted after <BOS> (:477-501), causal LM forward through
  Qwen2.5-0.5B.
* Context extraction for the action expert (verl/workers/rollout/
  hf_rollout.py:116-122): hidden[:, :num_patches] ++ the 64 action-token
  hidden states gathered via current|next action masks over labels[:, 1:].

TPU-first notes: per-tower image normalization fuses into the jitted forward;
the 64-position boolean gather becomes a static-shape argsort gather
(action_masks.gather_masked); the VLM is frozen in RFT, so callers wrap the
context in stop_gradient during policy updates (the reference backprops
through the VLM and discards the grads — fsdp_workers.py:435-449 never gives
its params to the optimizer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.models.action_masks import (
    NUM_TOKENS,
    gather_masked,
    get_current_action_mask,
    get_next_actions_mask,
    scatter_rows,
)
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.models.vit import ViT, ViTConfig, normalize_images


@dataclasses.dataclass(frozen=True)
class OpenVLAConfig:
    siglip: ViTConfig = ViTConfig.siglip_so400m()
    dino: ViTConfig = ViTConfig.dinov2_large_reg4()
    llm: TransformerConfig = TransformerConfig.qwen25_0_5b()
    num_patches: int = 256  # per image
    num_tokens: int = NUM_TOKENS
    proprio_dim: int = 8
    # number of camera views; each contributes a 6-channel dino|siglip stack
    # and 256 patches (reference num_images_in_input, modeling_prismatic.py
    # :209-231 — LIBERO eval defaults to 2: third-person + wrist,
    # run_libero_eval.py:99)
    num_images: int = 1

    @property
    def vision_dim(self) -> int:
        return self.dino.hidden_size + self.siglip.hidden_size

    @property
    def total_patches(self) -> int:
        """NUM_PATCHES in the reference's v1 path: per-image patches x
        num_images (modeling_prismatic.py:1464; no +1 for proprio in v1)."""
        return self.num_patches * self.num_images

    @staticmethod
    def tiny_test() -> "OpenVLAConfig":
        """Miniature config for CPU tests (same topology, tiny dims)."""
        return OpenVLAConfig(
            siglip=ViTConfig.siglip_so400m(
                image_size=28, patch_size=14, hidden_size=16, depth=3, num_heads=2,
                mlp_dim=32, dtype=jnp.float32, param_dtype=jnp.float32,
            ),
            dino=ViTConfig.dinov2_large_reg4(
                image_size=28, patch_size=14, hidden_size=16, depth=3, num_heads=2,
                mlp_dim=32, dtype=jnp.float32, param_dtype=jnp.float32,
            ),
            llm=TransformerConfig(
                vocab_size=152000, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2, qkv_bias=True,
                tie_word_embeddings=True, dtype=jnp.float32,
                param_dtype=jnp.float32, attn_impl="xla",
            ),
            num_patches=4,
            num_tokens=8,
        )


class PrismaticVisionBackbone(nn.Module):
    cfg: OpenVLAConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (B, H, W, 6*num_images) float in [0,1]; image i
        occupies channels [6i, 6i+6) as a dino|siglip stack
        (modeling_prismatic.py:199-231: `featurizer` is timm_model_ids[0] =
        DINOv2 on the first 3 channels of each stack, `fused_featurizer` is
        SigLIP on the last 3; per-image features concatenated [dino, siglip]
        on hidden, then images concatenated on the patch dim :225-231).
        Returns (B, num_images*P, 2176).

        TPU-first: instead of the reference's per-image python loop, the
        images fold into the batch dim so each tower runs ONCE at batch
        B*num_images — one big MXU-friendly matmul batch."""
        N = self.cfg.num_images
        if N > 1:
            B, H, W, _ = pixel_values.shape
            # (B, H, W, N, 6) -> (B, N, H, W, 6) -> (B*N, H, W, 6)
            pixel_values = pixel_values.reshape(B, H, W, N, 6)
            pixel_values = jnp.moveaxis(pixel_values, 3, 1).reshape(B * N, H, W, 6)
        img_d = normalize_images(pixel_values[..., 0:3], self.cfg.dino)
        img_s = normalize_images(pixel_values[..., 3:6], self.cfg.siglip)
        p_d = ViT(self.cfg.dino, name="featurizer")(img_d)
        p_s = ViT(self.cfg.siglip, name="fused_featurizer")(img_s)
        patches = jnp.concatenate([p_d, p_s], axis=-1)
        if N > 1:
            # unfold: (B*N, P, D) -> (B, N*P, D) — image 0's patches first,
            # matching torch.cat(all_patches, dim=1)
            patches = patches.reshape(B, N * patches.shape[1], patches.shape[-1])
        return patches


class PrismaticProjector(nn.Module):
    cfg: OpenVLAConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        llm_dim = self.cfg.llm.hidden_size
        dt = self.cfg.llm.dtype
        pd = self.cfg.llm.param_dtype
        x = nn.Dense(4 * self.cfg.vision_dim, dtype=dt, param_dtype=pd, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(llm_dim, dtype=dt, param_dtype=pd, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(llm_dim, dtype=dt, param_dtype=pd, name="fc3")(x)


class OpenVLA(nn.Module):
    """Policy VLM. `encode_context` is the single VLM forward both the
    stochastic rollout and the logp replay run (hf_rollout.py:103-122,
    dp_actor.py:118-139)."""

    cfg: OpenVLAConfig

    def setup(self):
        self.vision_backbone = PrismaticVisionBackbone(self.cfg)
        self.projector = PrismaticProjector(self.cfg)
        self.language_model = Decoder(self.cfg.llm)
        self.action_queries = nn.Embed(
            self.cfg.num_tokens,
            self.cfg.llm.hidden_size,
            embedding_init=nn.initializers.zeros,  # zero-init (modeling_prismatic.py:367)
            param_dtype=self.cfg.llm.param_dtype,
            name="action_queries",
        )

    def __call__(self, input_ids, pixel_values, labels, attention_mask):
        return self.encode_context(input_ids, pixel_values, labels, attention_mask)

    def encode_context(
        self,
        input_ids: jnp.ndarray,  # (B, S) right-padded
        pixel_values: jnp.ndarray,  # (B, H, W, 6) in [0,1]
        labels: jnp.ndarray,  # (B, S) with IGNORE_INDEX
        attention_mask: jnp.ndarray,  # (B, S) right-padded 1/0
    ) -> jnp.ndarray:
        """One multimodal forward; returns all_hidden_states
        (B, total_patches + num_tokens, llm_dim): [BOS+patch hiddens | action-
        query hiddens], exactly the context the DiT heads consume."""
        cfg = self.cfg
        B, S = input_ids.shape
        P = cfg.total_patches

        # --- token embeddings with action queries substituted (v1 path) ---
        tok_emb = self.language_model(input_ids, embed_only=True)  # (B, S, D)
        cur = get_current_action_mask(labels)
        nxt = get_next_actions_mask(labels)
        all_actions_mask = cur | nxt  # (B, S)
        queries = self.action_queries(jnp.arange(cfg.num_tokens))  # (64, D)
        queries = jnp.broadcast_to(queries[None], (B, cfg.num_tokens, queries.shape[-1]))
        _, idx = gather_masked(tok_emb, all_actions_mask, cfg.num_tokens)
        tok_emb = scatter_rows(tok_emb, idx, queries)

        # --- vision patches -> llm space, inserted after BOS ---
        patches = self.vision_backbone(pixel_values)
        patches = self.projector(patches)  # (B, P, D)
        mm_emb = jnp.concatenate([tok_emb[:, :1], patches.astype(tok_emb.dtype), tok_emb[:, 1:]], axis=1)
        kv_lens = attention_mask.sum(axis=-1).astype(jnp.int32) + P

        _, hidden, _ = self.language_model(
            inputs_embeds=mm_emb, kv_lens=kv_lens, compute_logits=False
        )  # (B, S+P, D) post final norm

        # --- context extraction (hf_rollout.py:116-122) ---
        text_hidden = hidden[:, P:-1]  # (B, S-1, D)
        shifted_labels = labels[:, 1:]
        cur_s = get_current_action_mask(shifted_labels)
        nxt_s = get_next_actions_mask(shifted_labels)
        act_hidden, _ = gather_masked(text_hidden, cur_s | nxt_s, cfg.num_tokens)
        task_latent = hidden[:, :P]  # includes BOS, drops last patch — as reference
        return jnp.concatenate([task_latent, act_hidden], axis=1)  # (B, P+64, D)

    def lm_forward(
        self,
        input_ids: jnp.ndarray,  # (B, S) right-padded caption tokens
        pixel_values: jnp.ndarray,  # (B, H, W, 6) in [0,1]
        attention_mask: jnp.ndarray,  # (B, S)
    ) -> jnp.ndarray:
        """Language-modeling forward for the PRETRAINING stages (the legacy
        prismatic stack's align/finetune objective: caption next-token loss
        with vision patches after BOS — reference
        prismatic/models/vlms/prismatic.py forward).  No action-query
        substitution; returns logits over the text region only,
        (B, S, vocab): logits[:, i] predicts input_ids[:, i+1]."""
        cfg = self.cfg
        B, S = input_ids.shape
        P = cfg.total_patches
        tok_emb = self.language_model(input_ids, embed_only=True)
        patches = self.projector(self.vision_backbone(pixel_values))
        mm_emb = jnp.concatenate(
            [tok_emb[:, :1], patches.astype(tok_emb.dtype), tok_emb[:, 1:]], axis=1
        )
        kv_lens = attention_mask.sum(axis=-1).astype(jnp.int32) + P
        logits, _, _ = self.language_model(
            inputs_embeds=mm_emb, kv_lens=kv_lens, compute_logits=True
        )  # (B, S+P, V)
        # text positions: BOS at 0, then patches, then input_ids[1:]
        return jnp.concatenate([logits[:, :1], logits[:, P + 1 :]], axis=1)
