"""im2col conv lowering (utils/conv_im2col.py) — exactness vs the native
lax conv on every configuration the repo's models emit, fwd and grad, plus
the patch round-trip through flax nn.Conv."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_rft_tpu.utils import conv_im2col as ci


def _dn(x_shape, w_shape):
    return jax.lax.conv_dimension_numbers(x_shape, w_shape, ("NHWC", "HWIO", "NHWC"))


CASES = [
    # (x_shape, w_shape, strides, padding, groups)      model site
    ((2, 16, 16, 8), (3, 3, 8, 12), (1, 1), ((1, 1), (1, 1)), 1),  # vae 3x3
    ((2, 16, 16, 8), (1, 1, 8, 4), (1, 1), "VALID", 1),  # quant 1x1
    ((2, 17, 17, 8), (3, 3, 8, 8), (2, 2), "VALID", 1),  # downsample
    ((2, 16, 16, 3), (8, 8, 3, 32), (8, 8), "VALID", 1),  # vit patch embed
    ((2, 20, 20, 6), (11, 1, 1, 6), (1, 1), "VALID", 6),  # ssim blur H
    ((2, 20, 20, 6), (1, 11, 1, 6), (1, 1), "VALID", 6),  # ssim blur W
    ((2, 15, 15, 4), (3, 3, 4, 4), (1, 1), "SAME", 1),  # SAME odd size
    ((2, 15, 15, 4), (3, 3, 4, 4), (2, 2), "SAME", 1),  # SAME strided
]


@pytest.mark.parametrize("x_shape,w_shape,strides,padding,groups", CASES)
def test_matches_native_fwd_and_grad(x_shape, w_shape, strides, padding, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x_shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=w_shape), jnp.float32)
    dn = _dn(x_shape, w_shape)

    def native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=groups,
        )

    def ours(x, w):
        return ci.conv2d_im2col(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=groups,
        )

    a, b = native(x, w), ours(x, w)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    cot = jnp.asarray(rng.normal(size=a.shape), jnp.float32)
    ga = jax.grad(lambda x, w: jnp.sum(native(x, w) * cot), argnums=(0, 1))(x, w)
    gb = jax.grad(lambda x, w: jnp.sum(ours(x, w) * cot), argnums=(0, 1))(x, w)
    for l, r in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(l), np.asarray(r), rtol=1e-4, atol=1e-4)


def test_unsupported_falls_back():
    """rhs dilation is outside the supported subset — must produce the
    native result (by delegating), not raise."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)), jnp.float32)
    dn = _dn(x.shape, w.shape)
    a = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(2, 2), dimension_numbers=dn
    )
    b = ci.conv2d_im2col(
        x, w, (1, 1), "SAME", rhs_dilation=(2, 2), dimension_numbers=dn
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_patch_through_flax_nn_conv():
    """enable_im2col_conv routes flax nn.Conv through the lowering and
    disable restores the native symbol; outputs agree bitwise-tolerant."""
    import flax.linen as nn

    conv = nn.Conv(8, (3, 3), padding=1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 12, 12, 4)), jnp.float32)
    params = conv.init(jax.random.key(0), x)
    ref = conv.apply(params, x)
    native_fn = jax.lax.conv_general_dilated
    ci.enable_im2col_conv()
    try:
        assert jax.lax.conv_general_dilated is ci.conv2d_im2col
        out = conv.apply(params, x)
    finally:
        ci.disable_im2col_conv()
    assert jax.lax.conv_general_dilated is native_fn
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)
