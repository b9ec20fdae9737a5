"""ops tests: masked stats (torch_functional parity), sampling, attention.

Mirrors the role of train/verl/tests/gpu_utility/test_torch_functional.py.
Pallas kernels run in interpret mode on CPU; compiled on TPU (VLA_RFT_TEST_TPU=1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.ops.attention import attention
from vla_rft_tpu.ops.masked import (
    entropy_from_logits,
    get_response_mask,
    logprobs_from_logits,
    masked_mean,
    masked_whiten,
)
from vla_rft_tpu.ops.sampling import apply_top_p, sample_token

from kernel_mode import INTERPRET


def test_logprobs_from_logits():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 5, 11)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 11, size=(2, 5)))
    lp = logprobs_from_logits(logits, labels)
    ref = jax.nn.log_softmax(logits, -1)
    ref = jnp.take_along_axis(ref, labels[..., None], -1)[..., 0]
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref), rtol=1e-5)


def test_entropy_from_logits():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(3, 7)), jnp.float32)
    h = entropy_from_logits(logits)
    p = np.asarray(jax.nn.softmax(logits, -1))
    ref = -(p * np.log(p)).sum(-1)
    np.testing.assert_allclose(np.asarray(h), ref, rtol=1e-5)


def test_masked_mean_whiten():
    x = jnp.asarray([[1.0, 2.0, 100.0], [3.0, 4.0, 100.0]])
    m = jnp.asarray([[1, 1, 0], [1, 1, 0]])
    np.testing.assert_allclose(float(masked_mean(x, m)), 2.5)
    w = masked_whiten(x, m)
    vals = np.asarray(w)[np.asarray(m, bool)]
    np.testing.assert_allclose(vals.mean(), 0.0, atol=1e-5)


def test_response_mask():
    ids = jnp.asarray([[5, 6, 9, 7, 9], [1, 2, 3, 4, 5]])
    m = get_response_mask(ids, eos_token_id=9)
    np.testing.assert_array_equal(np.asarray(m), [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])


def test_top_p_keeps_nucleus():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(apply_top_p(logits, 0.8))
    assert out[0, 0] > -1e29 and out[0, 1] > -1e29
    assert out[0, 2] <= -1e29 and out[0, 3] <= -1e29


def test_top_p_bisect_matches_sorted_reference():
    """The sort-free bisection nucleus must keep the same set as the classic
    descending-sort + exclusive-cumsum rule (up to boundary ties), on peaked,
    flat, and near-uniform distributions."""

    def sorted_ref(logits, p):
        sl = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sl, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < p
        thresh = jnp.min(
            jnp.where(keep_sorted, sl, jnp.inf), axis=-1, keepdims=True
        )
        return logits >= thresh

    rng = np.random.default_rng(3)
    cases = [
        jnp.asarray(rng.normal(size=(4, 997)) * 5.0, jnp.float32),  # peaked
        jnp.asarray(rng.normal(size=(4, 997)) * 0.01, jnp.float32),  # near-uniform
        jnp.asarray(rng.normal(size=(4, 997)), jnp.float32),
    ]
    for p in (0.3, 0.8, 0.95):
        for logits in cases:
            keep_new = np.asarray(apply_top_p(logits, p) > -1e29)
            keep_ref = np.asarray(sorted_ref(logits, p))
            # identical except possibly fp-boundary tokens; the kept MASS
            # must cover p on both and differ by at most the boundary prob
            probs = np.asarray(jax.nn.softmax(logits, -1))
            m_new = (probs * keep_new).sum(-1)
            m_ref = (probs * keep_ref).sum(-1)
            assert (m_new >= p - 1e-5).all() and (m_ref >= p - 1e-5).all()
            diff = keep_new ^ keep_ref
            assert (probs * diff).sum(-1).max() < 5e-3, (p, (probs * diff).sum(-1))
    # top token survives even when p <= pmax
    sharp = jnp.asarray([[10.0, 0.0, -5.0]])
    out = np.asarray(apply_top_p(sharp, 0.5))
    assert out[0, 0] > -1e29 and (out[0, 1:] <= -1e29).all()


def test_sample_token_greedy_and_random():
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    tok = sample_token(jax.random.key(0), logits, do_sample=False)
    assert int(tok[0]) == 1
    toks = [
        int(sample_token(jax.random.key(i), logits, temperature=1.0)[0]) for i in range(8)
    ]
    assert all(t == 1 for t in toks)  # overwhelming logit


# ------------------------------------------------------------------- attention
def _rand_qkv(rng, B=2, Sq=96, Sk=96, Hq=4, Hkv=2, D=32, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(B, Sk, Hkv, D)), dtype) * 0.3
    v = jnp.asarray(rng.normal(size=(B, Sk, Hkv, D)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    kv_lens = jnp.asarray([96, 70])
    ref = attention(q, k, v, causal=causal, kv_lens=kv_lens, impl="xla")
    out = attention(
        q, k, v, causal=causal, kv_lens=kv_lens, impl="pallas",
        block_q=32, block_k=32, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_unpadded_shapes_pad_internally():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, Sq=50, Sk=77)
    ref = attention(q, k, v, causal=True, impl="xla")
    out = attention(
        q, k, v, causal=True, impl="pallas", block_q=32, block_k=32, interpret=INTERPRET
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_q_offset_chunked_decode():
    """Chunked decode: attending with q chunk at offset into a longer kv."""
    rng = np.random.default_rng(2)
    B, Sk, Hq, Hkv, D = 2, 64, 4, 2, 32
    full_q = jnp.asarray(rng.normal(size=(B, Sk, Hq, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(B, Sk, Hkv, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(B, Sk, Hkv, D)), jnp.float32)
    ref = attention(full_q, k, v, causal=True, impl="xla")
    # last 32 queries as a chunk with offset 32
    chunk = full_q[:, 32:]
    off = jnp.full((B,), 32, jnp.int32)
    out = attention(
        chunk, k, v, causal=True, q_offset=off, impl="pallas",
        block_q=32, block_k=32, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 32:]), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grad_matches_xla(causal):
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, B=1, Sq=64, Sk=64, Hq=4, Hkv=2, D=32)
    kv_lens = jnp.asarray([50])

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, causal=causal, kv_lens=kv_lens, impl="xla") ** 2)

    def loss_fl(q, k, v):
        return jnp.sum(
            attention(
                q, k, v, causal=causal, kv_lens=kv_lens, impl="pallas",
                block_q=32, block_k=32, interpret=INTERPRET,
            )
            ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_fl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_flash_kv_starts_left_padding():
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, B=2, Sq=64, Sk=64)
    starts = jnp.asarray([0, 16])
    ref = attention(q, k, v, causal=True, kv_starts=starts, impl="xla")
    out = attention(
        q, k, v, causal=True, kv_starts=starts, impl="pallas",
        block_q=32, block_k=32, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    # row with left padding differs from unpadded attention
    ref_nopad = attention(q, k, v, causal=True, impl="xla")
    assert not np.allclose(np.asarray(ref[1, 30:]), np.asarray(ref_nopad[1, 30:]))


def test_decode_attention_kernel_matches_xla():
    from vla_rft_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(7)
    L, B, Hkv, G, S, D = 3, 2, 2, 2, 64, 32
    Hq = Hkv * G
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([40, 64])
    kv_starts = jnp.asarray([0, 8])
    for li in range(L):
        out = decode_attention(
            q, ck, cv, jnp.asarray(li), kv_lens, kv_starts, interpret=INTERPRET
        )
        k_all = jnp.swapaxes(ck[li], 1, 2)  # (B, S, Hkv, D)
        v_all = jnp.swapaxes(cv[li], 1, 2)
        ref = attention(
            q, k_all, v_all, causal=False, kv_lens=kv_lens, kv_starts=kv_starts,
            impl="xla",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_fused_decode_attention_matches_xla():
    from vla_rft_tpu.ops.fused_decode_attention import fused_decode_attention

    rng = np.random.default_rng(9)
    L, B, Hkv, G, S, D = 2, 2, 2, 2, 64, 32
    Hq = Hkv * G
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32) * 0.3
    k_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32) * 0.3
    v_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    idx = 37  # history length; write position
    kv_starts = jnp.asarray([0, 5])
    li = 1

    out, nck, ncv = fused_decode_attention(
        q, k_new, v_new, ck, cv, jnp.asarray(li), jnp.asarray(idx), kv_starts,
        block_k=16, interpret=INTERPRET,
    )
    # reference: DUS then full attention with kv_lens = idx+1
    k_t = jnp.swapaxes(k_new, 1, 2)[None]
    v_t = jnp.swapaxes(v_new, 1, 2)[None]
    rck = jax.lax.dynamic_update_slice(ck, k_t, (li, 0, 0, idx, 0))
    rcv = jax.lax.dynamic_update_slice(cv, v_t, (li, 0, 0, idx, 0))
    k_all = jnp.swapaxes(rck[li], 1, 2)
    v_all = jnp.swapaxes(rcv[li], 1, 2)
    ref = attention(
        q, k_all, v_all, causal=False, kv_lens=jnp.full((B,), idx + 1),
        kv_starts=kv_starts, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
    # cache write happened in the kernel too
    np.testing.assert_allclose(np.asarray(nck), np.asarray(rck), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ncv), np.asarray(rcv), atol=1e-6)


def test_decode_attention_int8_close_to_f32():
    from vla_rft_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(11)
    L, B, Hkv, G, S, D = 2, 2, 2, 1, 64, 32
    kf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32) * 0.3
    vf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
    # per-position symmetric int8 quantization (matches Attention.quant)
    sk = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-8)
    sv = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    ki = np.clip(np.round(kf / sk[..., None]), -127, 127).astype(np.int8)
    vi = np.clip(np.round(vf / sv[..., None]), -127, 127).astype(np.int8)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([40, 64])
    out = decode_attention(
        q, jnp.asarray(ki), jnp.asarray(vi), jnp.asarray(1), kv_lens,
        scales=(jnp.asarray(sk, jnp.float32), jnp.asarray(sv, jnp.float32)),
        interpret=INTERPRET,
    )
    # f32 reference on the DEQUANTIZED cache
    k_all = jnp.swapaxes(jnp.asarray(ki[1] * sk[1][..., None], jnp.float32), 1, 2)
    v_all = jnp.swapaxes(jnp.asarray(vi[1] * sv[1][..., None], jnp.float32), 1, 2)
    ref = attention(q, k_all, v_all, causal=False, kv_lens=kv_lens, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.03, rtol=0.03)


def test_decode_attention_packed_matches_unpacked():
    """Head-pair packed cache (lane-padding fix) must match the unpacked
    kernel bit-for-bit math-wise."""
    from vla_rft_tpu.models.transformer import pack_kv_heads, unpack_kv_heads
    from vla_rft_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(13)
    L, B, Hkv, G, S, D = 2, 2, 4, 2, 64, 32
    Hq = Hkv * G
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([50, 64])
    kv_starts = jnp.asarray([0, 4])
    pck, pcv = pack_kv_heads(ck), pack_kv_heads(cv)
    assert pck.shape == (L, B, Hkv // 2, S, 2 * D)
    np.testing.assert_allclose(np.asarray(unpack_kv_heads(pck)), np.asarray(ck))
    for li in range(L):
        ref = decode_attention(
            q, ck, cv, jnp.asarray(li), kv_lens, kv_starts, interpret=INTERPRET
        )
        out = decode_attention(
            q, pck, pcv, jnp.asarray(li), kv_lens, kv_starts, interpret=INTERPRET
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_attention_packed_int8():
    from vla_rft_tpu.models.transformer import pack_kv_heads
    from vla_rft_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(17)
    L, B, Hkv, G, S, D = 2, 2, 2, 1, 64, 32
    kf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32) * 0.3
    vf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
    sk = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-8)
    sv = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    ki = np.clip(np.round(kf / sk[..., None]), -127, 127).astype(np.int8)
    vi = np.clip(np.round(vf / sv[..., None]), -127, 127).astype(np.int8)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([40, 64])
    scales = (jnp.asarray(sk, jnp.float32), jnp.asarray(sv, jnp.float32))
    ref = decode_attention(
        q, jnp.asarray(ki), jnp.asarray(vi), jnp.asarray(1), kv_lens,
        scales=scales, interpret=INTERPRET,
    )
    out = decode_attention(
        q, pack_kv_heads(jnp.asarray(ki)), pack_kv_heads(jnp.asarray(vi)),
        jnp.asarray(1), kv_lens, scales=scales, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_decode_attention_block_b_variants():
    """Batch-blocked grid (block_b>1) matches the per-row grid exactly."""
    from vla_rft_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(23)
    L, B, Hkv, G, S, D = 2, 4, 2, 2, 64, 32
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([40, 64, 17, 50])
    kv_starts = jnp.asarray([0, 8, 0, 3])
    ref = decode_attention(
        q, ck, cv, jnp.asarray(1), kv_lens, kv_starts, interpret=INTERPRET, block_b=1
    )
    for bb in (2, 4):
        out = decode_attention(
            q, ck, cv, jnp.asarray(1), kv_lens, kv_starts, interpret=INTERPRET, block_b=bb
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_decode_attention_shared_matches_concat_xla():
    """Split-cache kernel (shared prefix + own segment, Sq>=1) == regular
    attention over the concatenated cache."""
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(29)
    L, B, Bu, Hkv, G, Sp, Sr, D = 2, 4, 2, 2, 2, 48, 32, 32
    Hq = Hkv * G
    pm = jnp.asarray([0, 0, 1, 1], jnp.int32)
    sck = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32) * 0.3
    scv = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32)
    shared_valid = 40  # < Sp: padded tail masked
    for Sq in (1, 7):
        q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)), jnp.float32) * 0.3
        own_lens = jnp.asarray([Sq, 10 + Sq, 20 + Sq, 32], jnp.int32)
        for li in range(L):
            out = decode_attention_shared(
                q, ck, cv, sck, scv, jnp.asarray(li), own_lens, pm,
                shared_valid=shared_valid, interpret=INTERPRET,
            )
            # reference: gather + slice + concat, masked attention
            k_sh = jnp.take(sck[li], pm, axis=0)[:, :, :shared_valid]
            v_sh = jnp.take(scv[li], pm, axis=0)[:, :, :shared_valid]
            k_all = jnp.swapaxes(jnp.concatenate([k_sh, ck[li]], axis=2), 1, 2)
            v_all = jnp.swapaxes(jnp.concatenate([v_sh, cv[li]], axis=2), 1, 2)
            ref = attention(
                q, k_all, v_all, causal=True,
                kv_lens=shared_valid + own_lens,
                q_offset=shared_valid + own_lens - Sq, impl="xla",
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
            )


def test_decode_attention_shared_starts_left_padding():
    """Per-row shared_starts (left-padded prompts in the shared prefix) —
    kernel (interpret) == concat + kv_starts-masked XLA attention."""
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(37)
    L, B, Bu, Hkv, G, Sp, Sr, D = 2, 4, 2, 2, 2, 48, 32, 32
    Hq = Hkv * G
    pm = jnp.asarray([0, 0, 1, 1], jnp.int32)
    sck = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32) * 0.3
    scv = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32)
    shared_valid = 40
    starts = jnp.asarray([6, 6, 0, 0], jnp.int32)  # unique 0 left-padded by 6
    for Sq in (1, 4):
        q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)), jnp.float32) * 0.3
        own_lens = jnp.asarray([Sq, 10 + Sq, 20 + Sq, 32], jnp.int32)
        for li in range(L):
            out = decode_attention_shared(
                q, ck, cv, sck, scv, jnp.asarray(li), own_lens, pm,
                shared_valid=shared_valid, interpret=INTERPRET,
                shared_starts=starts, block_b=2,
            )
            k_sh = jnp.take(sck[li], pm, axis=0)[:, :, :shared_valid]
            v_sh = jnp.take(scv[li], pm, axis=0)[:, :, :shared_valid]
            k_all = jnp.swapaxes(jnp.concatenate([k_sh, ck[li]], axis=2), 1, 2)
            v_all = jnp.swapaxes(jnp.concatenate([v_sh, cv[li]], axis=2), 1, 2)
            ref = attention(
                q, k_all, v_all, causal=True,
                kv_lens=shared_valid + own_lens,
                q_offset=shared_valid + own_lens - Sq,
                kv_starts=starts, impl="xla",
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
            )


def test_decode_attention_shared_packed_int8():
    """Packed head pairs + int8 quantized caches through the split kernel."""
    from vla_rft_tpu.models.transformer import pack_kv_heads
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(31)
    L, B, Bu, Hkv, G, Sp, Sr, D = 2, 2, 1, 2, 1, 48, 32, 32
    pm = jnp.zeros((B,), jnp.int32)

    def q8(x):
        s = np.maximum(np.abs(x).max(-1) / 127.0, 1e-8)
        return np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8), s

    skf = rng.normal(size=(L, Bu, Hkv, Sp, D)).astype(np.float32) * 0.3
    svf = rng.normal(size=(L, Bu, Hkv, Sp, D)).astype(np.float32)
    okf = rng.normal(size=(L, B, Hkv, Sr, D)).astype(np.float32) * 0.3
    ovf = rng.normal(size=(L, B, Hkv, Sr, D)).astype(np.float32)
    ski, sks = q8(skf)
    svi, svs = q8(svf)
    oki, oks = q8(okf)
    ovi, ovs = q8(ovf)
    shared_valid = 48
    Sq = 3
    q = jnp.asarray(rng.normal(size=(B, Sq, Hkv * G, D)), jnp.float32) * 0.3
    own_lens = jnp.asarray([Sq, 20], jnp.int32)
    li = 1
    out = decode_attention_shared(
        q,
        pack_kv_heads(jnp.asarray(oki)), pack_kv_heads(jnp.asarray(ovi)),
        pack_kv_heads(jnp.asarray(ski)), pack_kv_heads(jnp.asarray(svi)),
        jnp.asarray(li), own_lens, pm, shared_valid=shared_valid,
        scales=(jnp.asarray(oks, jnp.float32), jnp.asarray(ovs, jnp.float32)),
        shared_scales=(jnp.asarray(sks, jnp.float32), jnp.asarray(svs, jnp.float32)),
        interpret=INTERPRET,
    )
    # f32 reference on dequantized caches
    k_sh = jnp.asarray(ski[li] * sks[li][..., None], jnp.float32)[pm]
    v_sh = jnp.asarray(svi[li] * svs[li][..., None], jnp.float32)[pm]
    k_all = jnp.swapaxes(
        jnp.concatenate([k_sh, jnp.asarray(oki[li] * oks[li][..., None], jnp.float32)], axis=2), 1, 2
    )
    v_all = jnp.swapaxes(
        jnp.concatenate([v_sh, jnp.asarray(ovi[li] * ovs[li][..., None], jnp.float32)], axis=2), 1, 2
    )
    ref = attention(
        q, k_all, v_all, causal=True, kv_lens=shared_valid + own_lens,
        q_offset=shared_valid + own_lens - Sq, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.03, rtol=0.03)


def test_decode_attention_shared_block_b():
    """Vectorized batch blocks (block_b>1) match per-row grid exactly —
    including per-row own-cache lengths and packed+int8."""
    from vla_rft_tpu.models.transformer import pack_kv_heads
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(37)
    L, B, Bu, Hkv, G, Sp, Sr, D = 2, 8, 2, 2, 1, 48, 32, 32
    pm = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    sck = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32) * 0.3
    scv = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32) * 0.3
    own_lens = jnp.asarray([1, 5, 9, 13, 17, 21, 25, 32], jnp.int32)
    ref = decode_attention_shared(
        q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
        interpret=INTERPRET, block_b=1,
    )
    for bb in (2, 4):
        out = decode_attention_shared(
            q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
            interpret=INTERPRET, block_b=bb,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # packed int8 variant
    def q8(x):
        s = np.maximum(np.abs(x).max(-1) / 127.0, 1e-8)
        return np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8), s

    ski, sks = q8(np.asarray(sck))
    svi, svs = q8(np.asarray(scv))
    oki, oks = q8(np.asarray(ck))
    ovi, ovs = q8(np.asarray(cv))
    args = (
        q, pack_kv_heads(jnp.asarray(oki)), pack_kv_heads(jnp.asarray(ovi)),
        pack_kv_heads(jnp.asarray(ski)), pack_kv_heads(jnp.asarray(svi)),
        jnp.asarray(1), own_lens, pm,
    )
    kw = dict(
        shared_valid=40,
        scales=(jnp.asarray(oks, jnp.float32), jnp.asarray(ovs, jnp.float32)),
        shared_scales=(jnp.asarray(sks, jnp.float32), jnp.asarray(svs, jnp.float32)),
        interpret=INTERPRET,
    )
    ref8 = decode_attention_shared(*args, **kw, block_b=1)
    out8 = decode_attention_shared(*args, **kw, block_b=4)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8), atol=1e-5)


def test_decode_attention_shared_row_chunk():
    """Wide grid blocks with a bounded inner row chunk (block_b > row_chunk)
    match the per-row grid exactly, float and packed+int8."""
    from vla_rft_tpu.models.transformer import pack_kv_heads
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(41)
    L, B, Bu, Hkv, G, Sp, Sr, D = 2, 8, 2, 2, 1, 48, 32, 32
    pm = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    sck = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32) * 0.3
    scv = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32) * 0.3
    own_lens = jnp.asarray([1, 5, 9, 13, 17, 21, 25, 32], jnp.int32)
    ref = decode_attention_shared(
        q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
        interpret=INTERPRET, block_b=1,
    )
    # block_b must not span prefix groups (4 rows per prefix here)
    for bb, rc in ((4, 1), (4, 2)):
        out = decode_attention_shared(
            q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
            interpret=INTERPRET, block_b=bb, row_chunk=rc,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6, err_msg=f"bb={bb} rc={rc}"
        )
    # single shared prefix: the whole batch may ride one block
    pm0 = jnp.zeros((B,), jnp.int32)
    ref_one = decode_attention_shared(
        q, ck, cv, sck[:, :1], scv[:, :1], jnp.asarray(1), own_lens, pm0,
        shared_valid=40, interpret=INTERPRET, block_b=1,
    )
    for bb, rc in ((8, 2), (8, 4)):
        out = decode_attention_shared(
            q, ck, cv, sck[:, :1], scv[:, :1], jnp.asarray(1), own_lens, pm0,
            shared_valid=40, interpret=INTERPRET, block_b=bb, row_chunk=rc,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_one), atol=1e-6, err_msg=f"bb={bb} rc={rc}"
        )

    def q8(x):
        s = np.maximum(np.abs(x).max(-1) / 127.0, 1e-8)
        return np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8), s

    ski, sks = q8(np.asarray(sck))
    svi, svs = q8(np.asarray(scv))
    oki, oks = q8(np.asarray(ck))
    ovi, ovs = q8(np.asarray(cv))
    args = (
        q, pack_kv_heads(jnp.asarray(oki)), pack_kv_heads(jnp.asarray(ovi)),
        pack_kv_heads(jnp.asarray(ski)), pack_kv_heads(jnp.asarray(svi)),
        jnp.asarray(1), own_lens, pm,
    )
    kw = dict(
        shared_valid=40,
        scales=(jnp.asarray(oks, jnp.float32), jnp.asarray(ovs, jnp.float32)),
        shared_scales=(jnp.asarray(sks, jnp.float32), jnp.asarray(svs, jnp.float32)),
        interpret=INTERPRET,
    )
    ref8 = decode_attention_shared(*args, **kw, block_b=1)
    for bb, rc in ((4, 2), (4, 1)):
        out8 = decode_attention_shared(*args, **kw, block_b=bb, row_chunk=rc)
        np.testing.assert_allclose(
            np.asarray(out8), np.asarray(ref8), atol=1e-5, err_msg=f"bb={bb} rc={rc}"
        )


def test_decode_attention_shared_sq_row_chunk():
    """Sq>1 (action-chunk verify blocks) with block_b>row_chunk stays exact."""
    from vla_rft_tpu.ops.decode_attention import decode_attention_shared

    rng = np.random.default_rng(43)
    L, B, Bu, Hkv, G, Sp, Sr, D, Sq = 2, 4, 2, 2, 1, 48, 32, 32, 4
    pm = jnp.asarray([0, 0, 1, 1], jnp.int32)
    sck = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32) * 0.3
    scv = jnp.asarray(rng.normal(size=(L, Bu, Hkv, Sp, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Hkv, Sr, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, Sq, Hkv * G, D)), jnp.float32) * 0.3
    own_lens = jnp.asarray([4, 12, 20, 32], jnp.int32)
    ref = decode_attention_shared(
        q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
        interpret=INTERPRET, block_b=1,
    )
    out = decode_attention_shared(
        q, ck, cv, sck, scv, jnp.asarray(1), own_lens, pm, shared_valid=40,
        interpret=INTERPRET, block_b=2, row_chunk=1,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
