"""Push-env RFT-evidence plumbing: data collection schema, prompt layout,
tokenizer STE training forward, and the push model preset.

The heavyweight end-to-end run lives in tools/rft_evidence.py (artifact:
RFT_EVIDENCE.json); these tests pin the pieces it depends on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_rft_tpu.data.push_data import (
    CollectConfig,
    PushSegmentDataset,
    build_push_prompt,
    collect_push_segments,
    train_val_split,
)
from vla_rft_tpu.models.action_masks import ACTION_TOKEN_BEGIN_IDX


def test_push_prompt_layout():
    ids, attn, labels = build_push_prompt(32, 8)
    assert ids.shape == (32,) and ids[0] == 1
    span = labels != -100
    assert span.sum() == 8
    assert (ids[span] > ACTION_TOKEN_BEGIN_IDX).all()
    # action span is contiguous and inside the attended region
    pos = np.where(span)[0]
    assert (np.diff(pos) == 1).all()
    assert attn[pos].all() and attn[pos[-1] + 1] == 1  # EOS attended too


@pytest.fixture(scope="module")
def tiny_collection():
    pytest.importorskip("mujoco")
    return collect_push_segments(
        CollectConfig(n_segments=12, max_chunks_per_episode=4, seed=0)
    )


def test_collect_schema(tiny_collection):
    d = tiny_collection
    n = len(d["actions"])
    assert d["raw_pixel_values"].shape == (n, 9, 32, 32, 3)
    assert d["raw_pixel_values"].dtype == np.uint8
    assert d["policy_pixels"].shape == (n, 64, 64, 3)
    assert d["actions"].shape == (n, 8, 7)
    assert d["proprio"].shape == (n, 8)
    assert np.abs(d["actions"]).max() <= 1.0
    # env-truth replay hook: sim state restores the exact segment start
    from vla_rft_tpu.eval.mujoco_push_env import MujocoPushEnv

    env = MujocoPushEnv(int(d["task_id"][0]), camera_heights=128, camera_widths=128)
    env.reset()
    env.set_init_state(d["sim_states"][0])
    np.testing.assert_allclose(env.get_sim_state(), d["sim_states"][0], atol=1e-6)


def test_push_dataset_batch(tiny_collection):
    d = tiny_collection
    tr, va = train_val_split(d, val_frac=0.25, seed=0)
    assert set(tr) & set(va) == set()
    ds = PushSegmentDataset(d, batch_size=3, indices=tr, expert_targets=True)
    b = ds.next_batch()
    assert b["pixel_values"].shape == (3, 64, 64, 6)
    np.testing.assert_allclose(b["pixel_values"][..., :3], b["pixel_values"][..., 3:])
    assert b["actions"].shape == (3, 8, 7)
    assert b["raw_pixel_values"].shape == (3, 9, 32, 32, 3)
    assert b["input_ids"].shape == (3, 32)
    # resume determinism (StatefulDataLoader analog)
    state = ds.state_dict()
    b1 = ds.next_batch()
    ds.load_state_dict(state)
    b2 = ds.next_batch()
    np.testing.assert_array_equal(b1["actions"], b2["actions"])


def test_tokenizer_recon_train_gradients_reach_encoder():
    """recon_train must carry FSQ straight-through gradients into BOTH
    encoders (the indices-based __call__ is gradient-dead at the encoder —
    training through it would silently train only the decoder)."""
    from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ

    tok = CompressiveVQModelFSQ(
        block_out_channels=(8, 16, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, resolution=32, ctx_res=(8, 8), dyn_res=(4, 4),
        patch_size=2, max_att_resolution=8,
    )
    px = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 3, 32, 32, 3)), jnp.float32)
    params = tok.init(jax.random.key(0), px)

    def loss(p):
        rec = tok.apply(p, px, method=tok.recon_train)
        return jnp.mean((rec - px) ** 2)

    grads = jax.grad(loss)(params)
    g = grads["params"]
    enc_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["encoder"])
    )
    cond_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["cond_encoder"])
    )
    assert enc_norm > 0 and cond_norm > 0
    # recon shape matches input; dyn token grid is 4x4 = 16 per frame
    idx_c, idx_d = tok.apply(params, px, method=tok.tokenize)
    assert idx_c.shape == (1, 1, 64)
    assert idx_d.shape == (1, 2, 16)


def test_push_preset_shapes():
    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.models.factory import build_models

    c = vla_rft_default_config().apply_overrides([
        "data.video.segment_length=9",
        "processor.tokens_per_frame=16",
        "data.max_prompt_length=87",
        "data.max_response_length=184",
        "world_model_rollout.rollout.interact_max_tokens=16",
    ])
    b = build_models(c, "push")
    assert b.policy_image_size == 64
    assert b.wm_image_size == 32
    assert b.vla_cfg.num_patches == 64
    assert b.expert_cfg.num_actions_chunk == 8
    assert b.wm_roll_cfg.prompt_length == 87
    assert b.wm_roll_cfg.response_length == 184
