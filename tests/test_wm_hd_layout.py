"""The head-dense KV layout must be a pure layout change: greedy rollouts
match the 'heads' layout bit-for-bit on the XLA fallback path (CPU), for
both the split-cache and single-cache modes, int8 and bf16 caches."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig, generate_sequences

from kernel_mode import INTERPRET


def _mk(kv_layout, kv_dtype):
    cfg = TransformerConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=2, kv_cache_dtype=kv_dtype, kv_layout=kv_layout,
    )
    return Decoder(cfg)


@pytest.mark.parametrize("kv_dtype", ["int8", "bf16"])
@pytest.mark.parametrize("shared", [True, False])
def test_hd_layout_greedy_parity(kv_dtype, shared):
    B, F, V, A = 4, 2, 8, 3
    ctx = 16
    P = ctx + V + A
    roll = WMRolloutConfig(
        prompt_length=P, response_length=F * (V + A), num_frames=F,
        interact_max_tokens=V, action_dim=A, do_sample=False, cache_segments=2,
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 500, (B, P)), jnp.int32)
    actions = jnp.asarray(rng.integers(0, 500, (B, F + 1, A)), jnp.int32)

    outs = {}
    for layout in ("heads", "hd"):
        wm = _mk(layout, kv_dtype)
        params = wm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
        kw = {}
        ids = prompt
        if shared:
            n = 2
            kw = dict(
                shared_prefix=prompt[::n, : P - A],
                prefix_map=jnp.repeat(jnp.arange(B // n, dtype=jnp.int32), n),
            )
            ids = prompt[:, P - A :]
        outs[layout] = np.asarray(
            jax.jit(
                lambda p, r, i, a: generate_sequences(wm, p, r, i, a, roll, **kw)
            )(params, jax.random.key(1), ids, actions)
        )
    assert (outs["heads"] == outs["hd"]).mean() > 0.98, (
        outs["heads"][:2], outs["hd"][:2]
    )


def test_hd_cache_shapes():
    wm = _mk("hd", "int8")
    c = wm.init_cache(3, 70)
    assert c[0].shape == (2, 3, 128, 128)  # S aligned to 128, lanes Hkv*D
    assert c[2].shape == (2, 3, 2, 128)
    assert wm.cache_seq_axes() == (2, 2, 3, 3)
    wm2 = _mk("hd", "bf16")
    c2 = wm2.init_cache(3, 70)
    assert c2[0].shape == (2, 3, 72, 128)
    assert wm2.cache_seq_axes() == (2, 2)
    # fall back to 'heads' when lanes aren't 128-aligned
    cfg = dataclasses.replace(wm.cfg, num_kv_heads=3, num_heads=3, hidden_size=192)
    assert cfg.kv_layout_eff == "heads"


def test_uniform_prefix_run():
    from vla_rft_tpu.workers.wm_rollout import uniform_prefix_run

    assert uniform_prefix_run([0] * 16) == 16
    assert uniform_prefix_run([0, 1, 2, 3]) == 1
    # interleaved gt layout: 4 samples x (16 rollouts + 1 gt) = runs of 17
    local = [s for s in range(4) for _ in range(17)]
    assert uniform_prefix_run(local) == 17
    # misaligned runs degrade safely to 1
    assert uniform_prefix_run([0, 0, 0, 1, 1, 1, 2, 2]) == 1
    assert uniform_prefix_run([0, 0, 1, 1, 2, 2, 3, 3]) == 2


def test_effective_block_b_divisor_of_run():
    """block spanning two prefixes is the round-2 gt-branch bug; the clamp
    must pick a DIVISOR of the run, never gcd-style leftovers."""
    # probe the clamp arithmetic directly (mirrors generate_sequences)
    def eff(run, cap):
        return max(d for d in range(1, run + 1) if run % d == 0 and d <= cap)

    assert eff(17, 32) == 17
    assert eff(17, 16) == 1
    assert eff(16, 32) == 16
    assert eff(1, 32) == 1


@pytest.mark.parametrize("shared", [False, True])
def test_decode_step_fused_parity(shared):
    """Fused pallas decode step vs the flax reference path: cache writes
    within ONE int8 quantum / one bf16 ulp on scales (the quantization
    MATH is identical, but the two paths are separately-compiled XLA
    programs whose FMA/fusion choices round 1-ulp differently — measured
    maxdiff exactly 1 int8 step, incl. the rope-free v arm); logits close
    (the hd attention kernel int8-quantizes q/p where the CPU fallback
    attends in f32)."""
    from vla_rft_tpu.models.transformer import (
        decode_step_fused,
        quantize_decoder_params,
    )

    cfg = TransformerConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=3,
        num_heads=2, num_kv_heads=2, kv_cache_dtype="int8", kv_layout="hd",
    )
    wm = Decoder(cfg)
    params_bf16 = wm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_decoder_params(params_bf16, cfg)
    import dataclasses

    wm = Decoder(dataclasses.replace(cfg, weights_int8=True))

    rng = np.random.default_rng(0)
    B, P = 4, 24
    prompt = jnp.asarray(rng.integers(0, 500, (B, P)), jnp.int32)
    kw = {}
    if shared:
        P0 = 16
        shared_cache = wm.init_cache(2, P0)
        _, _, shared_cache = wm.apply(
            qparams, prompt[::2, :P0], cache=shared_cache, cache_index=0,
            logits_last_only=True,
        )
        pm = jnp.asarray([0, 0, 1, 1], jnp.int32)
        cache = wm.init_cache(B, 40)
        _, _, cache = wm.apply(
            qparams, prompt[:, P0:], cache=cache, cache_index=P0,
            kv_lens=jnp.full((B,), P, jnp.int32), logits_last_only=True,
            shared_cache=shared_cache, shared_len=P0, prefix_map=pm,
        )
        kw = dict(shared_cache=shared_cache, shared_len=P0, prefix_map=pm)
    else:
        cache = wm.init_cache(B, 40)
        _, _, cache = wm.apply(
            qparams, prompt, cache=cache, cache_index=0, logits_last_only=True
        )

    tok = jnp.asarray(rng.integers(0, 500, (B, 1)), jnp.int32)
    ref_logits, _, ref_cache = wm.apply(
        qparams, tok, cache=cache, cache_index=P, **kw
    )
    out_logits, _, out_cache = decode_step_fused(
        wm, qparams, tok, cache, jnp.int32(P), interpret=INTERPRET, **kw
    )

    # layer-0 cache writes bit-equal at the written position (identical
    # quantization math; deeper layers legitimately drift — the hd attention
    # kernel int8-quantizes q/p while the CPU fallback attends in f32, so
    # their inputs differ).  k/v int8 arms: S on axis 2; scales: axis 3.
    own_pos = P - (kw.get("shared_len", 0))
    for a, b in zip(ref_cache, out_cache):
        ax = 2 if a.dtype == jnp.int8 else 3
        av = np.asarray(jnp.take(a[0], own_pos, axis=ax - 1), np.float32)
        bv = np.asarray(jnp.take(b[0], own_pos, axis=ax - 1), np.float32)
        if a.dtype == jnp.int8:
            assert np.max(np.abs(av - bv)) <= 1  # one quantum
            assert (av != bv).mean() < 0.25
        else:  # bf16 scales: one ulp
            np.testing.assert_allclose(bv, av, rtol=1e-2)
    rl = np.asarray(ref_logits[:, -1], np.float32)
    ol = np.asarray(out_logits[:, -1], np.float32)
    assert (np.argmax(rl, -1) == np.argmax(ol, -1)).mean() >= 0.75
    np.testing.assert_allclose(ol, rl, atol=0.25, rtol=0.1)


def test_fused_rollout_traces(monkeypatch):
    """Abstract-trace the WHOLE fused rollout (gate forced to TPU): checks
    the generate_sequences <-> decode_step_fused plumbing (shapes, scan
    carries, cache threading) without hardware — pallas_call shape-evals."""
    import dataclasses

    from vla_rft_tpu.models.transformer import quantize_decoder_params
    from vla_rft_tpu.workers import wm_rollout as wr

    cfg = TransformerConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=2, kv_cache_dtype="int8", kv_layout="hd",
    )
    wm0 = Decoder(cfg)
    qparams = quantize_decoder_params(
        wm0.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32)), cfg
    )
    wm = Decoder(dataclasses.replace(cfg, weights_int8=True, decode_block_b=4))

    B, F, V, A = 4, 2, 8, 3
    ctx = 16
    P = ctx + V + A
    roll = wr.WMRolloutConfig(
        prompt_length=P, response_length=F * (V + A), num_frames=F,
        interact_max_tokens=V, action_dim=A, do_sample=False, cache_segments=2,
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 500, (B, P)), jnp.int32)
    actions = jnp.asarray(rng.integers(0, 500, (B, F + 1, A)), jnp.int32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    out = jax.eval_shape(
        lambda p, r, ids, acts: wr.generate_sequences(
            wm, p, r, ids, acts, roll,
            shared_prefix=prompt[::2, : P - A],
            prefix_map=jnp.asarray([0, 0, 1, 1], jnp.int32),
            prefix_run=2,
        ),
        qparams, jax.random.key(1), prompt[:, P - A :], actions,
    )
    assert out.shape == (B, F * (V + A)) and out.dtype == jnp.int32
