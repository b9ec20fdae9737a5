"""Visual tokenizers: CNNFSQModel256 and CompressiveVQModelFSQ.

Flax/NHWC ports of the reference tokenizers:
* CNNFSQModel256 — plain per-frame CNN FSQ autoencoder
  (train/verl/ivideogpt/tokenizer/vq_model.py:25-147), the 'cnn' path.
* CompressiveVQModelFSQ — context-compressive tokenizer
  (ivideogpt/ctx_tokenizer/compressive_vq_model.py:35-346), the 'ctx_cnn'
  path used by the LIBERO VLA-RFT run: full Encoder+FSQ for the context frame
  (32x32 = 1024 tokens), ConditionalEncoder + 4x4 patchify + linear + FSQ for
  dynamics frames (8x8 = 64 tokens), mirrored decoding.

Both are jit-friendly: encode/decode/tokenize/detokenize are pure functions of
(params, pixels/indices) with static frame counts.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.models.fsq import FSQ, get_fsq_levels
from vla_rft_tpu.models.vae import (
    ConditionalDecoder,
    ConditionalEncoder,
    Decoder,
    Encoder,
)


def _patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, (H/p)*(W/p), p*p*C) matching the torch unfold order
    (compressive_vq_model.py:230: features laid out [p, p, C] per patch)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # B, H/p, W/p, p, p, C
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def _depatchify(x: jnp.ndarray, h: int, w: int, p: int, c: int) -> jnp.ndarray:
    """Inverse of _patchify: (B, L, p*p*c) -> (B, h, w, c)."""
    B = x.shape[0]
    x = x.reshape(B, h // p, w // p, p, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, h, w, c)


class CNNFSQModel256(nn.Module):
    """Per-frame FSQ autoencoder ('cnn')."""

    block_out_channels: Sequence[int] = (128, 256, 256, 512, 768)
    layers_per_block: int = 2
    latent_channels: int = 64
    fsq_levels: int = 12
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        levels = get_fsq_levels(self.fsq_levels)
        self.fsq = FSQ(levels)
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            out_channels=3,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(len(levels), (1, 1), name="quant_linear", dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), name="post_quant_linear", dtype=self.dtype
        )

    def encode(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, C) or (B, H, W, C) float [0,1] -> token indices (B[, T], h*w)."""
        squeeze = pixels.ndim == 4
        if squeeze:
            pixels = pixels[:, None]
        B, T = pixels.shape[:2]
        x = pixels.reshape(B * T, *pixels.shape[2:])
        h = self.encoder(x)
        z = self.quant_conv(h)
        _, idx = self.fsq(z)  # (B*T, h, w)
        idx = idx.reshape(B, T, -1)
        return idx[:, 0] if squeeze else idx

    def decode(self, indices: jnp.ndarray, hw: Tuple[int, int] = (16, 16)) -> jnp.ndarray:
        """token indices (B, h*w) -> pixels (B, H, W, 3)."""
        B = indices.shape[0]
        codes = self.fsq.indices_to_codes(indices).reshape(B, hw[0], hw[1], -1)
        z = self.post_quant_conv(codes.astype(self.dtype))
        return self.decoder(z)

    def __call__(self, pixels):
        idx = self.encode(pixels)
        side = int(idx.shape[-1] ** 0.5)
        flat = idx.reshape(-1, idx.shape[-1])
        rec = self.decode(flat, (side, side))
        return rec.reshape(*pixels.shape[:-3], *rec.shape[1:]), idx


class CompressiveVQModelFSQ(nn.Module):
    """Context-compressive tokenizer ('ctx_cnn').

    ctx frame -> Encoder -> 1x1 conv -> FSQ @ 32x32 (1024 tokens)
    future frames -> ConditionalEncoder (cross-attends ctx features)
                  -> patchify(4) -> linear -> FSQ @ 8x8 (64 tokens)
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    vq_fsq_levels: int = 12
    dyn_fsq_levels: int = 12
    patch_size: int = 4
    resolution: int = 256
    max_att_resolution: int = 32
    ctx_res: Tuple[int, int] = (32, 32)
    dyn_res: Tuple[int, int] = (8, 8)
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        v_levels = get_fsq_levels(self.vq_fsq_levels)
        d_levels = get_fsq_levels(self.dyn_fsq_levels)
        self.quantize = FSQ(v_levels)
        self.dynamics_quantize = FSQ(d_levels)
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.cond_encoder = ConditionalEncoder(
            out_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            max_att_resolution=self.max_att_resolution,
            init_resolution=self.resolution,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            out_channels=3,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.cond_decoder = ConditionalDecoder(
            out_channels=3,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            groups=self.norm_num_groups,
            max_att_resolution=self.max_att_resolution,
            init_resolution=self.ctx_res[0],
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(len(v_levels), (1, 1), name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), name="post_quant_conv", dtype=self.dtype
        )
        p2c = self.latent_channels * self.patch_size * self.patch_size
        self.quant_linear = nn.Dense(len(d_levels), name="quant_linear", dtype=self.dtype)
        self.post_quant_linear = nn.Dense(p2c, name="post_quant_linear", dtype=self.dtype)

    @staticmethod
    def _repeat_feats(feats: List[jnp.ndarray], reps: int) -> List[jnp.ndarray]:
        """Broadcast per-context features to each future frame
        (compressive_vq_model.py:268-272: unsqueeze(1).repeat(T).reshape)."""
        return [jnp.repeat(f, reps, axis=0) for f in feats]

    def tokenize(self, pixel_values: jnp.ndarray):
        """(B, T, H, W, C) float -> (indices_c (B, 1, 1024), indices_d (B, T-1, 64)).

        Mirrors compressive_vq_model.py:250-293 with context_length=1.
        """
        B, T = pixel_values.shape[:2]
        ctx = pixel_values[:, 0]
        fut = pixel_values[:, 1:].reshape(B * (T - 1), *pixel_values.shape[2:])

        h, cond_feats = self.encoder(ctx, return_features=True)
        h = self.quant_conv(h)  # (B, 32, 32, 5)
        cond_feats = self._repeat_feats(cond_feats, T - 1)
        d = self.cond_encoder(fut, cond_feats)  # (B*(T-1), 32, 32, latent)
        d = _patchify(d, self.patch_size)  # (B*(T-1), 64, p*p*latent)
        d = self.quant_linear(d)  # (..., 5)

        _, info = self.quantize(h)  # (B, 32, 32)
        _, info_d = self.dynamics_quantize(d)  # (B*(T-1), 64)
        indices_c = info.reshape(B, 1, -1)
        indices_d = info_d.reshape(B, T - 1, -1)
        return indices_c, indices_d

    def ctx_decode(self, indices_c: jnp.ndarray):
        """(B, 1, 1024) ctx tokens -> (decoded ctx frame (B, H, W, 3),
        decoder feature pyramid [each (B, h, w, c)]).

        Split out of detokenize so the reward path can compute the ctx
        decode ONCE per unique sample per step and share the features
        across all rollouts and both the policy/gt branches."""
        B = indices_c.shape[0]
        ch, cw = self.ctx_res
        quant = self.quantize.indices_to_codes(indices_c.reshape(B, -1))
        quant = quant.reshape(B, ch, cw, -1).astype(self.dtype)
        quant2 = self.post_quant_conv(quant)
        return self.decoder(quant2, return_features=True)

    def detokenize_dyn(
        self, indices_d: jnp.ndarray, cond_feats
    ) -> jnp.ndarray:
        """(B, T, 64) dynamics tokens + per-SEQUENCE ctx features
        [(B, h, w, c)] -> future-frame pixels (B, T, H, W, 3)."""
        B, T = indices_d.shape[:2]
        ch, cw = self.ctx_res
        p = self.patch_size
        quant_d = self.dynamics_quantize.indices_to_codes(indices_d.reshape(B * T, -1))
        quant2_d = self.post_quant_linear(quant_d.astype(self.dtype))  # (B*T, 64, p*p*c)
        quant2_d = _depatchify(quant2_d, ch, cw, p, self.latent_channels)
        feats = self._repeat_feats(cond_feats, T)
        dec = self.cond_decoder(quant2_d, feats)  # (B*T, H, W, 3)
        return dec.reshape(B, T, *dec.shape[1:])

    def detokenize(self, indices_c: jnp.ndarray, indices_d: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, 1024), (B, T, 64) -> pixels (B, T+1, H, W, 3).

        Mirrors compressive_vq_model.py:296-346 (frame 0 = decoded context).
        """
        B = indices_c.shape[0]
        context_dec, cond_feats = self.ctx_decode(indices_c)
        dec = self.detokenize_dyn(indices_d, cond_feats)
        context_dec = context_dec.reshape(B, 1, *context_dec.shape[1:])
        return jnp.concatenate([context_dec, dec], axis=1)

    def __call__(self, pixel_values):
        idx_c, idx_d = self.tokenize(pixel_values)
        return self.detokenize(idx_c, idx_d)

    def recon_train(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """Differentiable reconstruction forward for TRAINING the tokenizer:
        identical dataflow to tokenize+detokenize but carrying the FSQ
        straight-through-estimator codes instead of integer indices, so
        gradients reach the encoders (the reference trains its tokenizer the
        same way — FSQ round-STE inside the autoencoder forward,
        compressive_vq_model.py forward + finite_scalar_quantize.py round_ste).

        pixel_values: (B, T, H, W, C) -> recon (B, T, H, W, C)
        (frame 0 = decoded context, frames 1: = conditional dynamics).
        """
        B, T = pixel_values.shape[:2]
        ch, cw = self.ctx_res
        p = self.patch_size

        ctx = pixel_values[:, 0]
        fut = pixel_values[:, 1:].reshape(B * (T - 1), *pixel_values.shape[2:])

        h, cond_feats = self.encoder(ctx, return_features=True)
        h = self.quant_conv(h)
        cond_feats_r = self._repeat_feats(cond_feats, T - 1)
        d = self.cond_encoder(fut, cond_feats_r)
        d = _patchify(d, p)
        d = self.quant_linear(d)

        quant_c, _ = self.quantize(h)  # STE codes (B, ch, cw, L)
        quant_d, _ = self.dynamics_quantize(d)  # (B*(T-1), Nd, L)

        quant2 = self.post_quant_conv(quant_c.astype(self.dtype))
        context_dec, dec_feats = self.decoder(quant2, return_features=True)

        quant2_d = self.post_quant_linear(quant_d.astype(self.dtype))
        quant2_d = _depatchify(quant2_d, ch, cw, p, self.latent_channels)
        feats = self._repeat_feats(dec_feats, T - 1)
        dec = self.cond_decoder(quant2_d, feats)
        dec = dec.reshape(B, T - 1, *dec.shape[1:])
        return jnp.concatenate([context_dec[:, None], dec], axis=1)


TOKENIZER = {
    "cnn": CNNFSQModel256,
    "ctx_cnn": CompressiveVQModelFSQ,
}
