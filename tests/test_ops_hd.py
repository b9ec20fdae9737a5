"""Parity tests for the head-dense decode kernels (ops/decode_attention_hd).

Reference: dense masked attention computed straight from the (L, B, S, HD)
cache arrays with f32 math.  Kernels run in interpret mode on CPU; compiled
on TPU under VLA_RFT_TEST_TPU=1 (the Mosaic lowering gate).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kernel_mode import INTERPRET
from vla_rft_tpu.ops.decode_attention_hd import (
    decode_attention_hd,
    decode_attention_shared_hd,
)


def _dense_ref(q, k, v, kv_lens, kv_starts=None, scale=None):
    """q (B, Sq, Hq, D); k/v (B, S, Hkv, D) f32 already dequantized.
    Causal within the trailing Sq block: query i sits at position
    kv_len - Sq + i."""
    B, Sq, Hq, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    kr = np.repeat(np.asarray(k, np.float32), G, axis=2)  # (B, S, Hq, D)
    vr = np.repeat(np.asarray(v, np.float32), G, axis=2)
    qn = np.asarray(q, np.float32)
    out = np.zeros((B, Sq, Hq, D), np.float32)
    for b in range(B):
        for i in range(Sq):
            qpos = int(kv_lens[b]) - Sq + i
            lo = int(kv_starts[b]) if kv_starts is not None else 0
            for h in range(Hq):
                s = (qn[b, i, h] @ kr[b, :, h].T) * scale  # (S,)
                mask = (np.arange(S) <= qpos) & (np.arange(S) >= lo)
                s = np.where(mask, s, -1e30)
                p = np.exp(s - s.max())
                p = np.where(mask, p, 0.0)
                out[b, i, h] = (p / max(p.sum(), 1e-30)) @ vr[b, :, h]
    return out


def _quant_cache(rng, L, B, S, Hkv, D):
    """Random int8 cache + per-(pos, head) scales; returns (arrays, dequant)."""
    k8 = rng.integers(-127, 128, (L, B, S, Hkv * D)).astype(np.int8)
    v8 = rng.integers(-127, 128, (L, B, S, Hkv * D)).astype(np.int8)
    sk = rng.uniform(0.01, 0.05, (L, B, Hkv, S)).astype(np.float32)
    sv = rng.uniform(0.01, 0.05, (L, B, Hkv, S)).astype(np.float32)

    def deq(c8, sc, li):
        c = c8[li].astype(np.float32).reshape(B, S, Hkv, D)
        return c * np.moveaxis(sc[li], 1, 2)[..., None]  # (B, S, Hkv) -> per pos

    return (
        jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(sk, jnp.bfloat16), jnp.asarray(sv, jnp.bfloat16),
        deq,
    )


@pytest.mark.parametrize("sq", [1, 8])
@pytest.mark.parametrize("quant", [False, True])
def test_plain_hd_parity(sq, quant):
    rng = np.random.default_rng(0)
    L, B, S, Hkv, D, G = 3, 4, 128, 4, 64, 1
    Hq = Hkv * G
    li = 1
    kv_lens = np.array([40, 64, 128, 77], np.int32)
    kv_starts = np.array([0, 5, 0, 12], np.int32)
    q = jnp.asarray(rng.normal(size=(B, sq, Hq, D)), jnp.float32)

    if quant:
        ck, cv, sk, sv, deq = _quant_cache(rng, L, B, S, Hkv, D)
        kd, vd = deq(np.asarray(ck), np.asarray(sk, np.float32), li), deq(
            np.asarray(cv), np.asarray(sv, np.float32), li
        )
        scales = (sk, sv)
    else:
        ck = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.bfloat16)
        cv = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.bfloat16)
        kd = np.asarray(ck[li], np.float32).reshape(B, S, Hkv, D)
        vd = np.asarray(cv[li], np.float32).reshape(B, S, Hkv, D)
        scales = None

    ref = _dense_ref(q, kd, vd, kv_lens, kv_starts)
    for bb, rc, oc in [(1, None, 4), (4, None, 2), (2, 1, 1)]:
        out = decode_attention_hd(
            q, ck, cv, jnp.int32(li), jnp.asarray(kv_lens),
            kv_starts=jnp.asarray(kv_starts), scales=scales,
            interpret=INTERPRET, block_b=bb, row_chunk=rc, own_chunk=oc,
        )
        tol = dict(atol=0.15, rtol=0.1) if quant else dict(atol=0.02, rtol=0.02)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, **tol)


@pytest.mark.parametrize("sq", [1, 7, 8])
@pytest.mark.parametrize("quant", [False, True])
def test_plain_hd_parity_production_shape(sq, quant):
    """WM production shapes: Hkv=Hq=16, D=64 (HD=1024 — exactly the v5e lane
    width), Sq covers single-token decode (1), the action-chunk append (7 —
    the round-2 Mosaic failure shape, N=112 rows), and frame chunks (8)."""
    rng = np.random.default_rng(7)
    L, B, S, Hkv, D = 2, 16, 256, 16, 64
    li = 1
    kv_lens = rng.integers(sq, S + 1, B).astype(np.int32)
    kv_starts = rng.integers(0, 8, B).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, sq, Hkv, D)), jnp.float32)

    if quant:
        ck, cv, sk, sv, deq = _quant_cache(rng, L, B, S, Hkv, D)
        kd = deq(np.asarray(ck), np.asarray(sk, np.float32), li)
        vd = deq(np.asarray(cv), np.asarray(sv, np.float32), li)
        scales = (sk, sv)
    else:
        ck = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.bfloat16)
        cv = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.bfloat16)
        kd = np.asarray(ck[li], np.float32).reshape(B, S, Hkv, D)
        vd = np.asarray(cv[li], np.float32).reshape(B, S, Hkv, D)
        scales = None

    ref = _dense_ref(q, kd, vd, kv_lens, kv_starts)
    out = decode_attention_hd(
        q, ck, cv, jnp.int32(li), jnp.asarray(kv_lens),
        kv_starts=jnp.asarray(kv_starts), scales=scales,
        interpret=INTERPRET, block_b=4, own_chunk=4,
    )
    tol = dict(atol=0.15, rtol=0.1) if quant else dict(atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, **tol)


@pytest.mark.parametrize("sq", [1, 7])
@pytest.mark.parametrize("quant", [False, True])
def test_shared_hd_parity_production_shape(sq, quant):
    """Shared-prefix variant at WM shapes (Hkv=16, HD=1024): the policy-chunk
    decode path (uniform prefix runs, block_b = run length)."""
    rng = np.random.default_rng(8)
    L, B, Sr, Sp, Hkv, D = 2, 8, 128, 256, 16, 64
    li = 0
    shared_valid = 250
    prefix_map = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    shared_starts = np.zeros(B, np.int32)
    kv_lens = rng.integers(sq, Sr + 1, B).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, sq, Hkv, D)), jnp.float32)

    ck, cv, sk, sv, deq = _quant_cache(rng, L, B, Sr, Hkv, D)
    sck, scv, ssk, ssv, deq_s = _quant_cache(rng, L, 2, Sp, Hkv, D)
    if quant:
        kd = deq(np.asarray(ck), np.asarray(sk, np.float32), li)
        vd = deq(np.asarray(cv), np.asarray(sv, np.float32), li)
        ksd = deq_s(np.asarray(sck), np.asarray(ssk, np.float32), li)
        vsd = deq_s(np.asarray(scv), np.asarray(ssv, np.float32), li)
        scales, sscales = (sk, sv), (ssk, ssv)
    else:
        ck = jnp.asarray(rng.normal(size=(L, B, Sr, Hkv * D)), jnp.bfloat16)
        cv = jnp.asarray(rng.normal(size=(L, B, Sr, Hkv * D)), jnp.bfloat16)
        sck = jnp.asarray(rng.normal(size=(L, 2, Sp, Hkv * D)), jnp.bfloat16)
        scv = jnp.asarray(rng.normal(size=(L, 2, Sp, Hkv * D)), jnp.bfloat16)
        kd = np.asarray(ck[li], np.float32).reshape(B, Sr, Hkv, D)
        vd = np.asarray(cv[li], np.float32).reshape(B, Sr, Hkv, D)
        ksd = np.asarray(sck[li], np.float32).reshape(2, Sp, Hkv, D)
        vsd = np.asarray(scv[li], np.float32).reshape(2, Sp, Hkv, D)
        scales = sscales = None

    k_all = np.concatenate([ksd[prefix_map], kd], axis=1)
    v_all = np.concatenate([vsd[prefix_map], vd], axis=1)
    ref = np.zeros((B, sq, Hkv, D), np.float32)
    scl = D**-0.5
    pos = np.arange(Sp + Sr)
    for b in range(B):
        for i in range(sq):
            qpos = Sp + int(kv_lens[b]) - sq + i
            valid = (pos < min(shared_valid, Sp)) | ((pos >= Sp) & (pos <= qpos))
            for h in range(Hkv):
                s = (np.asarray(q[b, i, h], np.float32) @ k_all[b, :, h].T) * scl
                s = np.where(valid, s, -1e30)
                p = np.exp(s - s.max())
                p = np.where(valid, p, 0.0)
                ref[b, i, h] = (p / max(p.sum(), 1e-30)) @ v_all[b, :, h]

    out = decode_attention_shared_hd(
        q, ck, cv, sck, scv, jnp.int32(li), jnp.asarray(kv_lens),
        jnp.asarray(prefix_map), shared_valid, scales=scales,
        shared_scales=sscales, interpret=INTERPRET, block_b=4, own_chunk=4,
        shared_starts=jnp.asarray(shared_starts),
    )
    tol = dict(atol=0.15, rtol=0.1) if quant else dict(atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, **tol)


@pytest.mark.parametrize("sq", [1, 8])
@pytest.mark.parametrize("quant", [True, False])
@pytest.mark.parametrize("g", [1, 7])
def test_shared_hd_parity(sq, quant, g):
    rng = np.random.default_rng(1)
    L, B, Sr, Sp, Hkv, D = 2, 8, 64, 96, 2, 64
    Hq = Hkv * g
    li = 0
    shared_valid = 90
    prefix_map = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    shared_starts = np.array([3, 3, 3, 3, 0, 0, 0, 0], np.int32)
    kv_lens = np.array([20, 33, 64, 41, 17, 64, 25, 58], np.int32)
    q = jnp.asarray(rng.normal(size=(B, sq, Hq, D)), jnp.float32)

    if quant:
        ck, cv, sk, sv, deq = _quant_cache(rng, L, B, Sr, Hkv, D)
        sck, scv, ssk, ssv, deq_s = _quant_cache(rng, L, 2, Sp, Hkv, D)
        kd = deq(np.asarray(ck), np.asarray(sk, np.float32), li)
        vd = deq(np.asarray(cv), np.asarray(sv, np.float32), li)
        ksd = deq_s(np.asarray(sck), np.asarray(ssk, np.float32), li)
        vsd = deq_s(np.asarray(scv), np.asarray(ssv, np.float32), li)
        scales, sscales = (sk, sv), (ssk, ssv)
    else:
        ck = jnp.asarray(rng.normal(size=(L, B, Sr, Hkv * D)), jnp.bfloat16)
        cv = jnp.asarray(rng.normal(size=(L, B, Sr, Hkv * D)), jnp.bfloat16)
        sck = jnp.asarray(rng.normal(size=(L, 2, Sp, Hkv * D)), jnp.bfloat16)
        scv = jnp.asarray(rng.normal(size=(L, 2, Sp, Hkv * D)), jnp.bfloat16)
        kd = np.asarray(ck[li], np.float32).reshape(B, Sr, Hkv, D)
        vd = np.asarray(cv[li], np.float32).reshape(B, Sr, Hkv, D)
        ksd = np.asarray(sck[li], np.float32).reshape(2, Sp, Hkv, D)
        vsd = np.asarray(scv[li], np.float32).reshape(2, Sp, Hkv, D)
        scales = sscales = None

    # dense reference over [shared row | own row] concatenated, explicit masks
    k_all = np.concatenate([ksd[prefix_map], kd], axis=1)  # (B, Sp+Sr, Hkv, D)
    v_all = np.concatenate([vsd[prefix_map], vd], axis=1)
    ref = np.zeros((B, sq, Hq, D), np.float32)
    G = Hq // Hkv
    scl = D**-0.5
    for b in range(B):
        kr = np.repeat(k_all[b], G, axis=1)
        vr = np.repeat(v_all[b], G, axis=1)
        Sall = Sp + Sr
        pos = np.arange(Sall)
        for i in range(sq):
            qpos = Sp + int(kv_lens[b]) - sq + i
            valid = (
                ((pos >= shared_starts[b]) & (pos < min(shared_valid, Sp)))
                | ((pos >= Sp) & (pos <= qpos))
            )
            for h in range(Hq):
                s = (np.asarray(q[b, i, h], np.float32) @ kr[:, h].T) * scl
                s = np.where(valid, s, -1e30)
                p = np.exp(s - s.max())
                p = np.where(valid, p, 0.0)
                ref[b, i, h] = (p / max(p.sum(), 1e-30)) @ vr[:, h]

    # block_b must keep prefix_map uniform per block: groups are 4 rows here
    for bb, rc, oc in [(4, None, 4), (1, None, 1), (2, 2, 2)]:
        out = decode_attention_shared_hd(
            q, ck, cv, sck, scv, jnp.int32(li), jnp.asarray(kv_lens),
            jnp.asarray(prefix_map), shared_valid, scales=scales,
            shared_scales=sscales, interpret=INTERPRET, block_b=bb, row_chunk=rc,
            own_chunk=oc, shared_starts=jnp.asarray(shared_starts),
        )
        tol = dict(atol=0.15, rtol=0.1) if quant else dict(atol=0.02, rtol=0.02)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, **tol)
