"""Decoder core tests: causality, padding, KV-cache decode == full forward.

Covers the consistency the reference checks via hf↔vllm logprob tests
(train/verl/tests/rollout/test_vllm_hf_loader.py): cached incremental decode
must reproduce the full teacher-forced forward.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig

CFG = TransformerConfig(
    vocab_size=97,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    qkv_bias=True,
    tie_word_embeddings=True,
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    attn_impl="xla",
)


def _init(cfg=CFG, B=2, S=12):
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)))
    params = model.init(jax.random.key(0), ids)
    return model, params, ids


def test_causality():
    model, params, ids = _init()
    logits, _, _ = model.apply(params, ids)
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % CFG.vocab_size)
    logits2, _, _ = model.apply(params, ids2)
    # earlier positions unaffected by changing the last token
    np.testing.assert_allclose(
        np.asarray(logits[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[:, -1]), np.asarray(logits2[:, -1]))


def test_padding_invariance():
    model, params, ids = _init(B=1, S=8)
    logits, _, _ = model.apply(params, ids, kv_lens=jnp.asarray([8]))
    padded = jnp.pad(ids, ((0, 0), (0, 4)))
    logits_p, _, _ = model.apply(params, padded, kv_lens=jnp.asarray([8]))
    np.testing.assert_allclose(
        np.asarray(logits[:, :8]), np.asarray(logits_p[:, :8]), atol=1e-5
    )


def test_kv_cache_matches_full_forward():
    model, params, ids = _init(B=2, S=12)
    full_logits, _, _ = model.apply(params, ids)

    max_len = 16
    cache = model.init_cache(2, max_len, dtype=jnp.float32)
    # prefill first 8
    pre_logits, _, cache = model.apply(
        params, ids[:, :8], cache=cache, cache_index=0
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :8]), atol=1e-4
    )
    # decode the remaining 4 one token at a time
    for t in range(8, 12):
        step_logits, _, cache = model.apply(
            params, ids[:, t : t + 1], cache=cache, cache_index=t
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), atol=1e-4
        )


def test_chunked_prefill_matches():
    model, params, ids = _init(B=2, S=12)
    full_logits, _, _ = model.apply(params, ids)
    cache = model.init_cache(2, 16, dtype=jnp.float32)
    _, _, cache = model.apply(params, ids[:, :6], cache=cache, cache_index=0)
    logits2, _, cache = model.apply(params, ids[:, 6:12], cache=cache, cache_index=6)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(full_logits[:, 6:12]), atol=1e-4
    )


def test_wm_config_shapes():
    cfg = TransformerConfig.wm_llama(vocab_size=9008)
    assert cfg.hidden_size == 1024 and cfg.num_layers == 24 and cfg.num_heads == 16
    cfg_q = TransformerConfig.qwen25_0_5b()
    assert cfg_q.num_kv_heads == 2 and cfg_q.tie_word_embeddings


def test_int8_kv_cache_decode_close_to_full_forward():
    """int8-quantized cache decode tracks the fp32 forward within quantization
    tolerance (rollout-only approximation; logprob paths use full forwards)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, kv_cache_dtype="int8")
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 12)))
    params = model.init(jax.random.key(0), ids)
    full_logits, _, _ = model.apply(params, ids)
    cache = model.init_cache(2, 16, dtype=jnp.float32)
    assert len(cache) == 4  # int8 values + scales
    _, _, cache = model.apply(params, ids[:, :8], cache=cache, cache_index=0)
    for t in range(8, 12):
        step_logits, _, cache = model.apply(
            params, ids[:, t : t + 1], cache=cache, cache_index=t
        )
        ref = np.asarray(full_logits[:, t])
        got = np.asarray(step_logits[:, 0])
        # logits agree to quantization noise; argmax should match
        np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.1)
        np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_weights_int8_decoder_close_to_bf16():
    """quantize_decoder_params + weights_int8 Decoder tracks the full-precision
    model: logits within ~1% relative of the f32 decoder, and the cached
    decode path runs (rollout-only weight quantization for the frozen WM)."""
    import dataclasses

    import numpy as np
    from vla_rft_tpu.models.transformer import (
        Decoder,
        TransformerConfig,
        quantize_decoder_params,
    )

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    dec = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)), jnp.int32)
    params = dec.init(jax.random.key(0), ids)
    logits, _, _ = dec.apply(params, ids)

    qcfg = dataclasses.replace(cfg, weights_int8=True)
    qdec = Decoder(qcfg)
    qparams = quantize_decoder_params(params, cfg)
    # param tree must match what a weights_int8 Decoder initializes
    ref_shapes = jax.eval_shape(
        lambda r: qdec.init(r, ids[:, :4]), jax.random.key(0)
    )
    got = jax.tree_util.tree_map(lambda x: x.shape, qparams)
    want = jax.tree_util.tree_map(lambda x: x.shape, ref_shapes)
    assert got == want, (got, want)

    qlogits, _, _ = qdec.apply(qparams, ids)
    denom = np.maximum(np.abs(np.asarray(logits)), 1.0)
    rel = np.abs(np.asarray(qlogits) - np.asarray(logits)) / denom
    # worst-case on a tiny random model; real-model typical error ~2%
    assert rel.max() < 0.15 and np.median(rel) < 0.02, (rel.max(), np.median(rel))

    # cached decode step parity with the quantized full forward
    cache = qdec.init_cache(2, 16)
    _, _, cache = qdec.apply(qparams, ids[:, :-1], cache=cache, cache_index=0)
    step_logits, _, _ = qdec.apply(
        qparams, ids[:, -1:], cache=cache, cache_index=ids.shape[1] - 1
    )
    np.testing.assert_allclose(
        np.asarray(step_logits[:, 0]), np.asarray(qlogits[:, -1]), atol=2e-4, rtol=2e-4
    )
