"""FSQ + visual tokenizer + processor tests.

Closes the reference's test gap for VLA-RFT components (SURVEY §4: "no tests
for TokenizerWorker"): FSQ code<->index round trip, compressive tokenizer
shape/token-space contract, ctx_msp sequence layout with exact offsets.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.fsq import FSQ, get_fsq_levels
from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ, CNNFSQModel256
from vla_rft_tpu.workers.processor import (
    ProcessorConfig,
    add_context_frame,
    ctx_msp_process,
    discretize_actions,
    split_response_tokens,
)

TINY = dict(block_out_channels=(8, 16), layers_per_block=1, latent_channels=4, norm_num_groups=4)


def test_fsq_levels_codebook():
    levels = get_fsq_levels(12)
    assert levels == [7, 5, 5, 5, 5]
    assert FSQ(levels).codebook_size == 4375


def test_fsq_roundtrip_all_indices():
    fsq = FSQ([7, 5, 5, 5, 5])
    idx = jnp.arange(4375)
    codes = fsq.indices_to_codes(idx)
    back = fsq.codes_to_indices(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_fsq_quantize_in_grid():
    fsq = FSQ([7, 5, 5])
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10, 3)), jnp.float32)
    codes, idx = fsq(z)
    # codes must be exactly on the level grid
    recon = fsq.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(recon), atol=1e-6)
    assert int(idx.min()) >= 0 and int(idx.max()) < fsq.codebook_size


def test_fsq_straight_through_grad():
    fsq = FSQ([7, 5, 5])
    z = jnp.ones((1, 2, 3)) * 0.3
    g = jax.grad(lambda z: jnp.sum(fsq.quantize(z)))(z)
    assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)


def test_compressive_tokenizer_shapes_and_roundtrip():
    # tiny config: resolution 32, 1 downsample -> ctx 16x16, patch 4 -> dyn 4x4
    model = CompressiveVQModelFSQ(
        resolution=32, ctx_res=(16, 16), dyn_res=(4, 4), max_att_resolution=16, **TINY
    )
    B, T = 2, 4  # T incl ctx frame
    px = jnp.asarray(np.random.default_rng(0).uniform(size=(B, T, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(0), px)  # __call__ covers enc+dec
    idx_c, idx_d = model.apply(params, px, method=model.tokenize)
    assert idx_c.shape == (B, 1, 256)
    assert idx_d.shape == (B, T - 1, 16)
    assert int(idx_c.max()) < 4375 and int(idx_d.max()) < 4375
    pixels = model.apply(params, idx_c, idx_d, method=model.detokenize)
    assert pixels.shape == (B, T, 32, 32, 3)


def test_cnn_tokenizer_shapes():
    model = CNNFSQModel256(block_out_channels=(8, 16), layers_per_block=1, latent_channels=8, norm_num_groups=4)
    B = 2
    px = jnp.asarray(np.random.default_rng(1).uniform(size=(B, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.key(0), px)
    idx = model.apply(params, px, method=model.encode)
    assert idx.shape == (B, 64)  # 16 -> 8 (one downsample): 8x8
    rec = model.apply(params, idx, (8, 8), method=model.decode)
    assert rec.shape == (B, 16, 16, 3)


# ----------------------------------------------------------------- processor
def test_discretize_actions():
    ranges = jnp.asarray([[-1.0, 1.0], [0.0, 2.0]])
    a = jnp.asarray([[[-1.0, 0.0], [1.0, 2.0], [0.0, 1.0]]])
    d = discretize_actions(a, ranges, 256)
    np.testing.assert_array_equal(np.asarray(d[0, 0]), [0, 0])
    np.testing.assert_array_equal(np.asarray(d[0, 1]), [255, 255])
    # float32: the 1e-8 guard vanishes, mid-range -> exactly 0.5 -> bin 128
    # (same result as the torch reference in fp32)
    np.testing.assert_array_equal(np.asarray(d[0, 2]), [128, 128])


def test_ctx_msp_layout_exact():
    """Exact LIBERO layout: 1024 ctx + 9x(64+7) = 1663; offsets 4375/8750;
    labels mask ctx + first dyn frame (processor.py:191-203)."""
    cfg = ProcessorConfig()
    B, T, A = 2, 9, 7
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(0, 4375, (B, 1, 1024)))
    dyn = jnp.asarray(rng.integers(0, 4375, (B, T, 64)))
    actions = jnp.asarray(rng.uniform(-1, 1, (B, T + 1, A)), jnp.float32)
    ranges = jnp.asarray(np.stack([-np.ones(A), np.ones(A)], -1), jnp.float32)

    out = ctx_msp_process(cfg, ctx, dyn, actions, ranges)
    ids = np.asarray(out["input_ids"])
    labels = np.asarray(out["labels"])
    assert ids.shape == (B, 1663)
    # ctx block offset into [4375, 8750)
    assert (ids[:, :1024] >= 4375).all() and (ids[:, :1024] < 8750).all()
    # frame 0: dyn tokens raw [0,4375), action tokens [8750, 9006)
    f0 = ids[:, 1024 : 1024 + 71]
    assert (f0[:, :64] < 4375).all()
    assert (f0[:, 64:] >= 8750).all() and (f0[:, 64:] < 8750 + 256).all()
    # labels: ctx + first dyn masked, everything else = ids
    assert (labels[:, : 1024 + 64] == -100).all()
    np.testing.assert_array_equal(labels[:, 1024 + 64 :], ids[:, 1024 + 64 :])
    # position ids are 0..1662
    np.testing.assert_array_equal(
        np.asarray(out["position_ids"])[0], np.arange(1663)
    )
    # gen_input_length split point: prompt = ctx + first frame = 1095
    assert 1024 + 71 == 1095
    assert out["action_ids"].shape == (B, T, A)


def test_add_context_frame():
    B, T, A = 2, 9, 7
    px = jnp.asarray(np.random.default_rng(0).uniform(size=(B, T, 8, 8, 3)))
    ac = jnp.asarray(np.random.default_rng(1).uniform(size=(B, T - 1, A)))
    pw, aw = add_context_frame(px, ac)
    assert pw.shape[1] == T + 1 and aw.shape[1] == T + 1
    np.testing.assert_array_equal(np.asarray(pw[:, 0]), np.asarray(pw[:, 1]))
    np.testing.assert_array_equal(np.asarray(aw[:, 0]), np.asarray(ac[:, 0]))
    np.testing.assert_array_equal(np.asarray(aw[:, -1]), np.asarray(ac[:, -1]))


def test_split_response_tokens():
    cfg = ProcessorConfig()
    B, F = 2, 8
    resp = jnp.asarray(
        np.random.default_rng(0).integers(0, 9008, (B, F * 71)), jnp.int32
    )
    vis = split_response_tokens(cfg, resp, F)
    assert vis.shape == (B, F, 64)
    assert int(vis.max()) < 4375
