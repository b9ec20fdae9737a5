"""Opt-in im2col lowering for 2-D convolutions.

Why this exists: the remote-compile tunnel used by the `axon` TPU backend
compiles `lax.conv_general_dilated` HLOs pathologically slowly (measured
270s for a single fresh 3x3 conv vs 2.5s for a fresh matmul of similar
size), which makes any conv-heavy program with uncached HLO — e.g. the
RFT-evidence pipeline's tokenizer/VAE training (tools/rft_evidence.py) —
uncompilable inside a reasonable budget.  Expressing the conv as strided
slicing + one dot produces mathematically identical results, still lands on
the MXU, and compiles in seconds because no conv autotuning runs.

This is OFF by default: the production trainer/bench path keeps the native
conv HLO (its compiled artifacts live in the persistent cache, and XLA's
fused conv is the better kernel at LIBERO shapes — im2col materializes
KH*KW copies of the activations).  Call `enable_im2col_conv()` (or set
VLA_RFT_CONV_IMPL=im2col before importing) to patch
`jax.lax.conv_general_dilated`; flax `nn.Conv` picks the patch up because
it resolves `lax.conv_general_dilated` at call time.

Supported (everything the repo's models use — vae.py, vit.py, lpips.py,
tokenizers.py): 2 spatial dims, NHWC/HWIO/NHWC layout, any stride,
"SAME"/"VALID"/explicit padding, feature_group_count (depthwise blurs),
no lhs/rhs dilation.  Anything else falls through to the native conv.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_NATIVE_CONV = None  # set on first enable


def _is_nhwc(dn, lhs_ndim: int) -> bool:
    """True if dimension_numbers describe the canonical 2-D NHWC/HWIO/NHWC
    layout (the only one flax emits for our models)."""
    if lhs_ndim != 4 or dn is None:
        return False
    return (
        tuple(dn.lhs_spec) == (0, 3, 1, 2)  # NHWC -> (batch, feature, *spatial)
        and tuple(dn.rhs_spec) == (3, 2, 0, 1)  # HWIO -> (out, in, *spatial)
        and tuple(dn.out_spec) == (0, 3, 1, 2)
    )


def _resolve_padding(padding, lhs_shape, rhs_shape, strides):
    """-> ((lo,hi),(lo,hi)) spatial pads, or None for unsupported forms."""
    KH, KW = rhs_shape[0], rhs_shape[1]
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        if padding.upper() == "SAME":
            out = []
            for size, k, s in zip(lhs_shape[1:3], (KH, KW), strides):
                o = -(-size // s)  # ceil
                pad = max(0, (o - 1) * s + k - size)
                out.append((pad // 2, pad - pad // 2))
            return tuple(out)
        return None
    pads = tuple((int(lo), int(hi)) for lo, hi in padding)
    return pads if len(pads) == 2 else None


def conv2d_im2col(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    batch_group_count=1,
    precision=None,
    preferred_element_type=None,
):
    """Drop-in for lax.conv_general_dilated on the supported subset; falls
    back to the native conv otherwise."""
    native = _NATIVE_CONV or jax.lax.conv_general_dilated

    def fallback():
        return native(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            batch_group_count=batch_group_count, precision=precision,
            preferred_element_type=preferred_element_type,
        )

    if (
        batch_group_count != 1
        or (lhs_dilation is not None and tuple(lhs_dilation) != (1, 1))
        or (rhs_dilation is not None and tuple(rhs_dilation) != (1, 1))
        or not _is_nhwc(dimension_numbers, lhs.ndim)
    ):
        return fallback()
    pads = _resolve_padding(padding, lhs.shape, rhs.shape, window_strides)
    if pads is None:
        return fallback()

    B, H, W, Cin = lhs.shape
    KH, KW, Cin_g, Cout = rhs.shape
    G = int(feature_group_count)
    if Cin != Cin_g * G or Cout % G:
        return fallback()
    sh, sw = window_strides

    x = jnp.pad(lhs, ((0, 0), pads[0], pads[1], (0, 0)))
    Hp, Wp = x.shape[1], x.shape[2]
    Ho = (Hp - KH) // sh + 1
    Wo = (Wp - KW) // sw + 1
    if Ho <= 0 or Wo <= 0:
        return fallback()

    # taps stacked on a new axis: (B, Ho, Wo, KH*KW, Cin).  The python loop
    # is over the (static, small) kernel footprint only.
    taps = [
        x[:, i : i + (Ho - 1) * sh + 1 : sh, j : j + (Wo - 1) * sw + 1 : sw, :]
        for i in range(KH)
        for j in range(KW)
    ]
    p = jnp.stack(taps, axis=3)

    kw = {}
    if preferred_element_type is not None:
        kw["preferred_element_type"] = preferred_element_type
    if G == 1:
        out = jnp.einsum(
            "bhwki,kio->bhwo",
            p.reshape(B, Ho, Wo, KH * KW, Cin),
            rhs.reshape(KH * KW, Cin, Cout),
            precision=precision,
            **kw,
        )
    else:
        # lax grouped-conv semantics: output channels are contiguous blocks
        # of Cout/G per input group
        pg = p.reshape(B, Ho, Wo, KH * KW, G, Cin_g)
        wg = rhs.reshape(KH * KW, Cin_g, G, Cout // G)
        out = jnp.einsum(
            "bhwkgi,kigo->bhwgo", pg, wg, precision=precision, **kw
        ).reshape(B, Ho, Wo, Cout)
    if preferred_element_type is None and out.dtype != np.result_type(lhs, rhs):
        out = out.astype(np.result_type(lhs, rhs))
    return out


def enable_im2col_conv() -> None:
    """Patch jax.lax.conv_general_dilated with the im2col lowering
    (idempotent).  Flax nn.Conv resolves the symbol at call time, so every
    model in the process inherits it.

    Caveats (this is a process-wide monkeypatch, opt-in by design):
    - modules that bound the symbol directly (`from jax.lax import
      conv_general_dilated`) keep the native conv — none in this repo do;
    - functions traced while a different impl was active keep that lowering
      in jit caches, so BOTH toggles clear jax's compilation caches to keep
      the process impl-consistent (prewarmed on-disk caches are unaffected).
    """
    global _NATIVE_CONV
    if _NATIVE_CONV is not None:
        return
    _NATIVE_CONV = jax.lax.conv_general_dilated
    jax.lax.conv_general_dilated = conv2d_im2col
    jax.clear_caches()


def disable_im2col_conv() -> None:
    global _NATIVE_CONV
    if _NATIVE_CONV is not None:
        jax.lax.conv_general_dilated = _NATIVE_CONV
        _NATIVE_CONV = None
        jax.clear_caches()


import os  # noqa: E402

if os.environ.get("VLA_RFT_CONV_IMPL") == "im2col":  # pragma: no cover
    enable_im2col_conv()
