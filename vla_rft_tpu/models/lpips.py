"""LPIPS perceptual loss (VGG16 features) + PSNR/SSIM, pure JAX.

Replaces the reference's torch LPIPS (train/verl/ivideogpt/lpips.py:54-175,
VGG16 up to relu5_3 with unit-normalized activations and learned 1x1 "lin"
heads) and piqa's PSNR/SSIM (verl/workers/fsdp_workers.py:1726-1727).
Inputs NHWC in [-1, 1] for LPIPS (the tokenizer worker feeds real*2-1,
fsdp_workers.py:1735-1737) and [0, 1] for PSNR/SSIM.

Weight conversion from the torchvision VGG16 + lpips vgg.pth checkpoint is in
tools/convert_weights.py; randomly initialized weights preserve shapes and
are used for shape/throughput tests when checkpoints are unavailable.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (channels, num_convs) per stage; features tapped after the
# last relu of each stage (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips input scaling layer constants (lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        idx = 0
        for s, (ch, n_convs) in enumerate(_VGG_STAGES):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            feats.append(x)
            if s < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips.py LPIPS.forward: scaled inputs -> VGG taps -> unit-norm on the
    channel dim -> squared diff -> 1x1 lin heads -> spatial mean -> sum."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, real: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """real/pred: (B, H, W, 3) in [-1, 1]. Returns per-sample loss (B,)."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(self.dtype, name="vgg")
        f0 = vgg((real - shift) / scale)
        f1 = vgg((pred - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.constant(1.0 / d.shape[-1]),
                name=f"lin{i}",
            )(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def psnr(real: jnp.ndarray, pred: jnp.ndarray, value_range: float = 1.0, eps: float = 1e-8):
    """piqa.PSNR(reduction='none') over (B, H, W, C) in [0,1] -> (B,)."""
    mse = jnp.mean((real - pred) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(value_range**2 / (mse + eps))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(real: jnp.ndarray, pred: jnp.ndarray, value_range: float = 1.0):
    """piqa.SSIM(window_size=11, sigma=1.5, reduction='none') -> (B,).

    Separable gaussian filtering via depthwise convs (valid padding)."""
    k = _gaussian_kernel()
    C = real.shape[-1]

    def blur(x):
        # x: (B, H, W, C); separable filter over H then W, per channel
        kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, C))  # (11,1,1,C)
        kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, C))
        dn = jax.lax.conv_dimension_numbers(x.shape, (11, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
        )
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
        )
        return x

    c1 = (0.01 * value_range) ** 2
    c2 = (0.03 * value_range) ** 2
    mu_x = blur(real)
    mu_y = blur(pred)
    sxx = blur(real * real) - mu_x * mu_x
    syy = blur(pred * pred) - mu_y * mu_y
    sxy = blur(real * pred) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
