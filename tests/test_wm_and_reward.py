"""World-model rollout + reward pipeline tests.

Covers the reference's hf<->vllm consistency checks
(tests/rollout/test_vllm_hf_loader.py) translated to this design: the scan
rollout's greedy decode must match step-by-step decode, and teacher-forced
logprob of a generated sequence must be consistent with the rollout's own
sampling distribution support. Plus LPIPS/PSNR/SSIM sanity and msp reward
semantics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.lpips import LPIPS, psnr, ssim
from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.workers.processor import ProcessorConfig
from vla_rft_tpu.workers.reward import RewardConfig, ac_reward, aggregate_msp, msp_reward
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig, compute_log_prob, generate_sequences

WM_CFG = TransformerConfig(
    vocab_size=120, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
    attn_impl="xla",
)
ROLL = WMRolloutConfig(
    prompt_length=10, response_length=3 * 6, num_frames=3,
    interact_max_tokens=4, action_dim=2, do_sample=False,  # greedy for determinism
)


def _init_wm(B=2):
    wm = Decoder(WM_CFG)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 100, (B, ROLL.prompt_length)), jnp.int32)
    actions = jnp.asarray(rng.integers(100, 119, (B, 4, 2)), jnp.int32)
    params = wm.init(jax.random.key(0), prompt)
    return wm, params, prompt, actions


def test_wm_rollout_shapes_and_layout():
    wm, params, prompt, actions = _init_wm()
    resp = generate_sequences(wm, params, jax.random.key(1), prompt, actions, ROLL)
    assert resp.shape == (2, ROLL.response_length)
    # teacher-forced action tokens appear at the right slots
    r = np.asarray(resp).reshape(2, 3, 6)
    for f in range(3):
        np.testing.assert_array_equal(r[:, f, 4:], np.asarray(actions[:, f + 1]))


def test_wm_greedy_rollout_matches_manual_decode():
    """The scan loop == a hand-rolled full-forward argmax loop."""
    wm, params, prompt, actions = _init_wm(B=1)
    resp = np.asarray(
        generate_sequences(wm, params, jax.random.key(1), prompt, actions, ROLL)
    )[0]

    seq = list(np.asarray(prompt)[0])
    out = []
    for f in range(3):
        for _ in range(4):
            logits, _, _ = wm.apply(params, jnp.asarray([seq], jnp.int32))
            tok = int(jnp.argmax(logits[0, -1]))
            seq.append(tok)
            out.append(tok)
        for a in np.asarray(actions)[0, f + 1]:
            seq.append(int(a))
            out.append(int(a))
    np.testing.assert_array_equal(resp, np.asarray(out))


def test_wm_segmented_cache_matches_single_cache():
    """Valid-prefix cache bounding (cache_segments>1) is a pure perf
    transform: identical sampled tokens to the single full-size cache."""
    import dataclasses

    wm, params, prompt, actions = _init_wm()
    roll_sampled = dataclasses.replace(ROLL, do_sample=True, top_p=0.9)
    ref = generate_sequences(
        wm, params, jax.random.key(3), prompt, actions,
        dataclasses.replace(roll_sampled, cache_segments=1),
    )
    for n_seg in (2, 3, 8):  # 8 > num_frames exercises the clamp
        out = generate_sequences(
            wm, params, jax.random.key(3), prompt, actions,
            dataclasses.replace(roll_sampled, cache_segments=n_seg),
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wm_shared_prefix_prefill_matches_full_prompt():
    """Shared-prefix prefill (unique heads + per-row tails + cache gather)
    is bit-identical to prefilling the full concatenated prompt."""
    import dataclasses

    wm, params, prompt, actions = _init_wm(B=4)
    # rows 0-1 share a prompt head, rows 2-3 share another (tails all differ)
    p0 = ROLL.prompt_length - 3
    prompt = np.array(prompt)  # writable copy
    prompt[1, :p0] = prompt[0, :p0]
    prompt[3, :p0] = prompt[2, :p0]
    prompt = jnp.asarray(prompt)
    roll = dataclasses.replace(ROLL, do_sample=True, top_p=0.9)

    ref = generate_sequences(wm, params, jax.random.key(5), prompt, actions, roll)
    shared = prompt[::2, :p0]
    pm = jnp.asarray([0, 0, 1, 1], jnp.int32)
    out = generate_sequences(
        wm, params, jax.random.key(5), prompt[:, p0:], actions, roll,
        shared_prefix=shared, prefix_map=pm,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wm_logprob_of_greedy_is_max():
    wm, params, prompt, actions = _init_wm(B=1)
    resp = generate_sequences(wm, params, jax.random.key(1), prompt, actions, ROLL)
    full = jnp.concatenate([prompt, resp], axis=1)
    lp = compute_log_prob(wm, params, full, ROLL.response_length)
    assert lp.shape == (1, ROLL.response_length)
    # greedy visual tokens must be the argmax -> logp >= log(1/vocab)
    logits, _, _ = wm.apply(params, full)
    pred = jnp.argmax(logits[:, ROLL.prompt_length - 1 : -1], axis=-1)
    vis_mask = np.zeros(ROLL.response_length, bool)
    for f in range(3):
        vis_mask[f * 6 : f * 6 + 4] = True
    np.testing.assert_array_equal(
        np.asarray(pred)[0, vis_mask], np.asarray(resp)[0, vis_mask]
    )


# ------------------------------------------------------------------ reward
def test_psnr_ssim_identity():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 16, 16, 3)), jnp.float32)
    assert float(psnr(x, x).min()) > 70
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-4)
    y = jnp.clip(x + 0.3, 0, 1)
    assert float(psnr(x, y)[0]) < float(psnr(x, x)[0])
    assert float(ssim(x, y)[0]) < 0.99


def test_lpips_zero_on_identity():
    lp = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    params = lp.init(jax.random.key(0), x, x)
    d_same = lp.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.5, -1, 1)
    assert float(lp.apply(params, x, y)[0]) > 0


def test_aggregate_msp_modes():
    loss = jnp.asarray([[1.0, 2.0, 3.0]])
    assert abs(float(aggregate_msp(loss, RewardConfig(msp_reward_aggregate="mean"))[0]) - 2.0) < 1e-6
    assert abs(float(aggregate_msp(loss, RewardConfig(msp_reward_aggregate="last"))[0]) - 3.0) < 1e-6
    d = RewardConfig(msp_reward_aggregate="discount", msp_reward_discount=0.5)
    w = np.asarray([0.25, 0.5, 1.0])
    expected = (np.asarray([1, 2, 3]) * w).sum() / w.sum()
    np.testing.assert_allclose(float(aggregate_msp(loss, d)[0]), expected, rtol=1e-6)


def test_msp_reward_end_to_end_tiny():
    proc = ProcessorConfig(visual_token_num=4375, tokens_per_frame=16, action_dim=2)
    rcfg = RewardConfig(num_frames=2)
    tok = CompressiveVQModelFSQ(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, resolution=32, ctx_res=(16, 16), dyn_res=(4, 4),
        max_att_resolution=16,
    )
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(size=(2, 3, 32, 32, 3)), jnp.float32)
    tok_params = tok.init(jax.random.key(0), px)
    lp = LPIPS()
    lp_params = lp.init(jax.random.key(1), px[:, 0] * 2 - 1, px[:, 0] * 2 - 1)

    B, F = 2, 2
    resp = jnp.asarray(rng.integers(0, 9000, (B, F * (16 + 2))), jnp.int32)
    gt_resp = jnp.asarray(rng.integers(0, 9000, (B, F * (16 + 2))), jnp.int32)
    ctx = jnp.asarray(rng.integers(4375, 8750, (B, 1, 256)), jnp.int32)

    reward, metrics = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, ctx, gt_responses=gt_resp
    )
    assert reward.shape == resp.shape
    r = np.asarray(reward)
    assert (r[:, :-1] == 0).all() and (r[:, -1] < 0).all()  # -loss at last token
    assert np.isfinite(float(metrics["critic/recon_loss/mean"]))
    # identical rollouts -> zero recon loss and strictly higher (=0) reward
    reward_same, m_same = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, gt_resp, ctx, gt_responses=gt_resp
    )
    np.testing.assert_allclose(float(m_same["critic/recon_loss/mean"]), 0.0, atol=1e-6)
    assert float(reward_same[:, -1].min()) > float(r[:, -1].max()) - 1e-6


def test_msp_reward_precomputed_ctx_feats_matches():
    """The ctx-feats fast path (ctx decoded once per unique sample, features
    gathered per row) must equal the full detokenize path exactly."""
    proc = ProcessorConfig(visual_token_num=4375, tokens_per_frame=16, action_dim=2)
    rcfg = RewardConfig(num_frames=2)
    tok = CompressiveVQModelFSQ(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, resolution=32, ctx_res=(16, 16), dyn_res=(4, 4),
        max_att_resolution=16,
    )
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.uniform(size=(2, 3, 32, 32, 3)), jnp.float32)
    tok_params = tok.init(jax.random.key(0), px)
    lp = LPIPS()
    lp_params = lp.init(jax.random.key(1), px[:, 0] * 2 - 1, px[:, 0] * 2 - 1)

    B, F = 4, 2  # 2 unique ctx rows tiled x2
    resp = jnp.asarray(rng.integers(0, 9000, (B, F * 18)), jnp.int32)
    gt_resp = jnp.asarray(rng.integers(0, 9000, (B, F * 18)), jnp.int32)
    ctx_u = jnp.asarray(rng.integers(4375, 8750, (2, 1, 256)), jnp.int32)
    ctx_map = jnp.asarray([0, 0, 1, 1], jnp.int32)
    ctx = jnp.take(ctx_u, ctx_map, axis=0)

    ref, mref = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, ctx, gt_responses=gt_resp
    )
    _, feats = tok.apply(tok_params, ctx_u - 4375, method=tok.ctx_decode)
    out, mout = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, None,
        gt_responses=gt_resp, ctx_feats=feats, ctx_map=ctx_map,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)
    for k in mref:
        np.testing.assert_allclose(float(mout[k]), float(mref[k]), atol=1e-6)


def test_msp_reward_unique_gt_matches_expanded():
    """gt_branch_per_sample reward path: passing UNIQUE gt responses +
    gt_map/gt_feat_idx must equal expanding the gt rows per rollout."""
    proc = ProcessorConfig(visual_token_num=4375, tokens_per_frame=16, action_dim=2)
    rcfg = RewardConfig(num_frames=2)
    tok = CompressiveVQModelFSQ(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, resolution=32, ctx_res=(16, 16), dyn_res=(4, 4),
        max_att_resolution=16,
    )
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform(size=(2, 3, 32, 32, 3)), jnp.float32)
    tok_params = tok.init(jax.random.key(0), px)
    lp = LPIPS()
    lp_params = lp.init(jax.random.key(1), px[:, 0] * 2 - 1, px[:, 0] * 2 - 1)

    B, F, U = 4, 2, 2  # 2 unique samples x 2 rollouts
    resp = jnp.asarray(rng.integers(0, 9000, (B, F * 18)), jnp.int32)
    gt_u = jnp.asarray(rng.integers(0, 9000, (U, F * 18)), jnp.int32)
    ctx_u = jnp.asarray(rng.integers(4375, 8750, (U, 1, 256)), jnp.int32)
    ctx_map = jnp.asarray([0, 0, 1, 1], jnp.int32)
    _, feats = tok.apply(tok_params, ctx_u - 4375, method=tok.ctx_decode)

    ref, mref = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, None,
        gt_responses=jnp.take(gt_u, ctx_map, axis=0),
        ctx_feats=feats, ctx_map=ctx_map,
    )
    out, mout = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, None,
        gt_responses=gt_u, ctx_feats=feats, ctx_map=ctx_map,
        gt_map=ctx_map, gt_feat_idx=jnp.arange(U, dtype=jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)
    for k in mref:
        np.testing.assert_allclose(float(mout[k]), float(mref[k]), atol=1e-6)


def test_msp_reward_predecoded_gt_frames_matches():
    """The trainer's detok-once path (decode unique gt rollouts up front,
    pass gathered pixel frames as real_frames) must equal decoding the gt
    responses inside msp_reward."""
    from vla_rft_tpu.workers.reward import detokenize_response_frames

    proc = ProcessorConfig(visual_token_num=4375, tokens_per_frame=16, action_dim=2)
    rcfg = RewardConfig(num_frames=2)
    tok = CompressiveVQModelFSQ(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, resolution=32, ctx_res=(16, 16), dyn_res=(4, 4),
        max_att_resolution=16,
    )
    rng = np.random.default_rng(6)
    px = jnp.asarray(rng.uniform(size=(2, 3, 32, 32, 3)), jnp.float32)
    tok_params = tok.init(jax.random.key(0), px)
    lp = LPIPS()
    lp_params = lp.init(jax.random.key(1), px[:, 0] * 2 - 1, px[:, 0] * 2 - 1)

    B, F, U = 4, 2, 2
    resp = jnp.asarray(rng.integers(0, 9000, (B, F * 18)), jnp.int32)
    gt_u = jnp.asarray(rng.integers(0, 9000, (U, F * 18)), jnp.int32)
    ctx_u = jnp.asarray(rng.integers(4375, 8750, (U, 1, 256)), jnp.int32)
    ctx_map = jnp.asarray([0, 0, 1, 1], jnp.int32)
    _, feats = tok.apply(tok_params, ctx_u - 4375, method=tok.ctx_decode)

    ref, mref = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, None,
        gt_responses=gt_u, ctx_feats=feats, ctx_map=ctx_map,
        gt_map=ctx_map, gt_feat_idx=jnp.arange(U, dtype=jnp.int32),
    )
    gt_frames = detokenize_response_frames(
        tok, tok_params, proc, F, gt_u, feats, jnp.arange(U, dtype=jnp.int32)
    )
    out, mout = msp_reward(
        tok, tok_params, lp, lp_params, proc, rcfg, resp, None,
        real_frames=jnp.take(gt_frames, ctx_map, axis=0),
        ctx_feats=feats, ctx_map=ctx_map,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6)
    for k in mref:
        np.testing.assert_allclose(float(mout[k]), float(mref[k]), atol=2e-6)


def test_ac_reward():
    gt = jnp.zeros((2, 3, 2))
    pred = jnp.ones((2, 3, 2)) * 0.5
    r, m = ac_reward(gt, pred, "l1")
    np.testing.assert_allclose(np.asarray(r), -0.5)
    r2, _ = ac_reward(gt, pred, "mse")
    np.testing.assert_allclose(np.asarray(r2), -0.25)
    r3, _ = ac_reward(gt, pred, "huber", huber_delta=0.1)
    np.testing.assert_allclose(np.asarray(r3), -(0.1 * (0.5 - 0.05)), rtol=1e-5)


def test_wm_speculative_greedy_exact():
    """Speculative decode (copy-prev-frame drafts + rejection sampling) is
    EXACT: greedy responses are bit-identical to plain decode, for both the
    shared-prefix split-cache path and the plain path."""
    wm, params, prompt, actions = _init_wm(B=4)
    p0 = ROLL.prompt_length - 3
    prompt = np.array(prompt)
    prompt[1, :p0] = prompt[0, :p0]
    prompt[3, :p0] = prompt[2, :p0]
    prompt = jnp.asarray(prompt)
    shared = prompt[::2, :p0]
    pm = jnp.asarray([0, 0, 1, 1], jnp.int32)

    ref = generate_sequences(
        wm, params, jax.random.key(2), prompt[:, p0:], actions, ROLL,
        shared_prefix=shared, prefix_map=pm,
    )
    for k in (2, 3):
        out = generate_sequences(
            wm, params, jax.random.key(2), prompt[:, p0:], actions,
            dataclasses.replace(ROLL, speculative_k=k),
            shared_prefix=shared, prefix_map=pm,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # plain (non-shared) path too
    ref2 = generate_sequences(wm, params, jax.random.key(4), prompt, actions, ROLL)
    out2 = generate_sequences(
        wm, params, jax.random.key(4), prompt, actions,
        dataclasses.replace(ROLL, speculative_k=2),
    )
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))


def test_wm_speculative_sampling_distribution():
    """Sampled mode: rejection sampling preserves the decode distribution —
    marginal token histograms of the first frame match plain decode across
    many rows with an identical prompt."""
    B = 192
    wm = Decoder(WM_CFG)
    rng = np.random.default_rng(3)
    one_prompt = rng.integers(0, 100, (1, ROLL.prompt_length))
    prompt = jnp.asarray(np.repeat(one_prompt, B, axis=0), jnp.int32)
    actions = jnp.asarray(
        np.repeat(rng.integers(100, 119, (1, 4, 2)), B, axis=0), jnp.int32
    )
    params = wm.init(jax.random.key(0), prompt[:1])
    roll = dataclasses.replace(
        ROLL, do_sample=True, top_p=0.9, num_frames=1, response_length=6
    )
    p0 = roll.prompt_length - 3
    pm = jnp.zeros((B,), jnp.int32)
    shared = prompt[:1, :p0]

    def hist(resp, pos):
        h = np.bincount(np.asarray(resp)[:, pos], minlength=120).astype(np.float64)
        return h / h.sum()

    ref = generate_sequences(
        wm, params, jax.random.key(7), prompt[:, p0:], actions, roll,
        shared_prefix=shared, prefix_map=pm,
    )
    ref2 = generate_sequences(
        wm, params, jax.random.key(23), prompt[:, p0:], actions, roll,
        shared_prefix=shared, prefix_map=pm,
    )
    out = generate_sequences(
        wm, params, jax.random.key(11), prompt[:, p0:], actions,
        dataclasses.replace(roll, speculative_k=2),
        shared_prefix=shared, prefix_map=pm,
    )
    # calibrate against the plain-vs-plain null (finite-sample TV over a
    # near-flat random-logit distribution is large by itself)
    for pos in range(4):  # the 4 sampled visual tokens of the frame
        null_tv = 0.5 * np.abs(hist(ref, pos) - hist(ref2, pos)).sum()
        tv = 0.5 * np.abs(hist(ref, pos) - hist(out, pos)).sum()
        assert tv < null_tv + 0.12, (pos, tv, null_tv)
