"""Multi-image (wrist-camera) VLM input + eval-time center-crop parity.

Reference semantics pinned here:
- PrismaticVisionBackbone multi-image forward (modeling_prismatic.py:209-231):
  each 6-channel image stack is split 3+3 across the DINOv2/SigLIP towers,
  per-image features concat on hidden, images concat on the PATCH dim.
- run_libero_eval.py:99 `num_images_in_input: int = 2` (third-person + wrist)
  and :102,140 eval-time center crop for aug-trained checkpoints.
- openvla_utils.center_crop_image/crop_and_resize (:577-657): 0.9-area
  center crop via tf.image.crop_and_resize, resized back to the input size.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_rft_tpu.models.prismatic import OpenVLA, OpenVLAConfig, PrismaticVisionBackbone


def test_backbone_multi_image_matches_per_image_loop():
    """The TPU-first batch-folded multi-image forward must equal the
    reference's per-image python loop: run each 6-ch stack separately,
    concat on the patch dim (modeling_prismatic.py:225-231)."""
    cfg1 = OpenVLAConfig.tiny_test()
    cfg2 = dataclasses.replace(cfg1, num_images=2)
    bb1 = PrismaticVisionBackbone(cfg1)
    bb2 = PrismaticVisionBackbone(cfg2)
    H = cfg1.dino.image_size
    rng = np.random.default_rng(0)
    px = rng.uniform(size=(2, H, H, 12)).astype(np.float32)

    params = bb2.init(jax.random.key(0), jnp.asarray(px))
    folded = bb2.apply(params, jnp.asarray(px))  # (B, 2P, D)

    per_img = [
        bb1.apply(params, jnp.asarray(px[..., 6 * i : 6 * i + 6])) for i in range(2)
    ]
    ref = jnp.concatenate(per_img, axis=1)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref), rtol=1e-6, atol=1e-6)
    assert folded.shape == (2, 2 * ref.shape[1] // 2, cfg1.vision_dim)


def test_openvla_multi_image_forward_shapes():
    """Full tiny VLM forward with 2 cameras: hidden covers
    total_patches + num_tokens and differs from the single-image run."""
    cfg2 = dataclasses.replace(OpenVLAConfig.tiny_test(), num_images=2)
    vla = OpenVLA(cfg2)
    H = cfg2.dino.image_size
    B, S = 2, 24
    rng = np.random.default_rng(1)
    input_ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    labels = np.full((B, S), -100, np.int32)
    labels[:, -cfg2.num_tokens - 1 : -1] = 151386 + 1  # action-token span
    attn = np.ones((B, S), np.int32)
    px = rng.uniform(size=(B, H, H, 12)).astype(np.float32)

    params = vla.init(
        jax.random.key(0), jnp.asarray(input_ids), jnp.asarray(px),
        jnp.asarray(labels), jnp.asarray(attn),
    )
    hidden = vla.apply(
        params, jnp.asarray(input_ids), jnp.asarray(px),
        jnp.asarray(labels), jnp.asarray(attn),
    )
    assert hidden.shape == (B, cfg2.total_patches + cfg2.num_tokens, cfg2.llm.hidden_size)
    assert cfg2.total_patches == 2 * cfg2.num_patches


def _tf_center_crop_reference(img_uint8: np.ndarray) -> np.ndarray:
    """The reference's own center_crop_image math, run through TF
    (openvla_utils.py:627-657 verbatim semantics)."""
    tf = pytest.importorskip("tensorflow")
    image = tf.convert_to_tensor(img_uint8)
    image = tf.image.convert_image_dtype(image, tf.float32)
    batch_size, crop_scale = 1, 0.9
    image = tf.expand_dims(image, axis=0)
    new = tf.reshape(tf.clip_by_value(tf.sqrt(crop_scale), 0, 1), shape=(1,))
    off = (1 - new) / 2
    boxes = tf.stack([off, off, off + new, off + new], axis=1)
    h, w = img_uint8.shape[0], img_uint8.shape[1]
    image = tf.image.crop_and_resize(image, boxes, tf.range(batch_size), (h, w))
    image = image[0]
    image = tf.clip_by_value(image, 0, 1)
    image = tf.image.convert_image_dtype(image, tf.uint8, saturate=True)
    return image.numpy()


def test_center_crop_golden_vs_tf():
    from vla_rft_tpu.eval.libero_eval import center_crop_image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(224, 224, 3)).astype(np.uint8)
    ours = center_crop_image(img)
    ref = _tf_center_crop_reference(img)
    # bilinear resampling in f32: allow 1 uint8 ulp of rounding skew
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02  # and only on round-to-nearest ties


def test_center_crop_non_square():
    from vla_rft_tpu.eval.libero_eval import center_crop_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(96, 128, 3)).astype(np.uint8)
    ours = center_crop_image(img)
    ref = _tf_center_crop_reference(img)
    assert ours.shape == img.shape
    assert np.abs(ours.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_assemble_pixels_layout():
    """Channel layout: [img, img, wrist, wrist] — each camera feeds BOTH
    towers of its own 6-channel slot (the pre-fix code wrongly fed the
    wrist cam to the SigLIP tower of slot 0)."""
    from vla_rft_tpu.eval.policy import assemble_pixels

    img = np.full((8, 8, 3), 200, np.uint8)
    wrist = np.full((8, 8, 3), 100, np.uint8)
    obs = {"full_image": img, "proprio": np.zeros(7), "wrist_image": wrist}

    one = assemble_pixels(obs, num_images=1)
    assert one.shape == (8, 8, 6)
    np.testing.assert_allclose(one[..., 0:3], one[..., 3:6])
    np.testing.assert_allclose(one[..., 0], 200 / 255.0)

    two = assemble_pixels(obs, num_images=2)
    assert two.shape == (8, 8, 12)
    np.testing.assert_allclose(two[..., 0:6], one)
    np.testing.assert_allclose(two[..., 6], 100 / 255.0)
    np.testing.assert_allclose(two[..., 6:9], two[..., 9:12])

    # missing wrist camera: the last available view repeats
    solo = assemble_pixels({"full_image": img}, num_images=2)
    np.testing.assert_allclose(solo[..., 0:6], solo[..., 6:12])


def test_prepare_observation_wrist():
    from vla_rft_tpu.eval.libero_eval import prepare_observation

    obs = {
        "agentview_image": np.zeros((64, 64, 3), np.uint8),
        "robot0_eye_in_hand_image": np.full((64, 64, 3), 50, np.uint8),
        "robot0_eef_pos": np.zeros(3),
        "robot0_eef_quat": np.array([0, 0, 0, 1.0]),
        "robot0_gripper_qpos": np.zeros(2),
    }
    one = prepare_observation(obs, 32, num_images_in_input=1)
    assert "wrist_image" not in one
    two = prepare_observation(obs, 32, num_images_in_input=2)
    assert two["wrist_image"].shape == (32, 32, 3)
    assert two["full_image"].shape == (32, 32, 3)
