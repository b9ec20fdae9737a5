"""Isolate the r5 push-WM speculative-verify divergence: on TPU, greedy
spec decode emitted copy-prev drafts at 0.875 rate vs plain greedy's 0.355
(bit-equality 0.30), while CPU is exactly 1.0 in every config.  The verify
chunk (c = 1+spec_k = 3 tokens, per-row cache_index/kv_lens) rides
`decode_attention_hd` at push shapes (Hkv=4, D=64 -> HD=256); r3's spec
artifacts were exact on TPU at HD=768/S=6, so suspicion is a
shape-dependent kernel bug at small HD / small query chunks.

This tool compares the kernel against the XLA attend path DIRECTLY on
identical inputs: multi-token query chunk, per-row kv_lens, hd-layout f32
cache — sweeping (Hkv, sq, B) — and prints max|kernel - xla| per config.

Run on the real chip: python tools/hd_spec_repro.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp


def run_case(B, Hkv, D, sq, Sr, seed=0, block_b=1, interpret=False):
    from vla_rft_tpu.ops.attention import attention
    from vla_rft_tpu.ops.decode_attention_hd import decode_attention_hd

    rng = np.random.default_rng(seed)
    L = 2
    HD = Hkv * D
    Hq = Hkv  # G=1 (WM configs have num_heads == num_kv_heads)
    ck = jnp.asarray(rng.normal(size=(L, B, Sr, HD)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.normal(size=(L, B, Sr, HD)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, sq, Hq, D)), jnp.float32) * 0.3
    # per-row valid lengths incl. the chunk (speculative rows advance at
    # different rates) — keep them < Sr and spread out
    kv_lens = jnp.asarray(
        rng.integers(sq + 3, Sr - 1, (B,)), jnp.int32
    )
    li = jnp.asarray(1, jnp.int32)

    out_k = np.asarray(
        jax.jit(
            lambda q, ck, cv, li, kl: decode_attention_hd(
                q, ck, cv, li, kl, None, block_b=block_b, interpret=interpret
            )
        )(q, ck, cv, li, kv_lens)
    )

    # XLA reference: same mask semantics (query i sees pos < kv_len-(sq-1)+i)
    k_all = ck[1].reshape(B, Sr, Hkv, D)
    v_all = cv[1].reshape(B, Sr, Hkv, D)
    q_offset = kv_lens - sq  # absolute position of query 0
    out_x = np.asarray(
        jax.jit(
            lambda q, k, v, kl, qo: attention(
                q, k, v, causal=True, kv_lens=kl, q_offset=qo, impl="xla"
            )
        )(q, k_all, v_all, kv_lens, q_offset)
    )
    err = np.abs(out_k - out_x).max()
    rel = err / max(np.abs(out_x).max(), 1e-9)
    return float(err), float(rel)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cases = [
        # (B, Hkv, D, sq, Sr)            # what it isolates
        (2, 4, 64, 3, 288),              # the failing push-WM verify shape
        (2, 4, 64, 1, 288),              # same shape, single-token (prod-ok?)
        (2, 12, 64, 6, 288),             # the r3 synthetic shape (worked)
        (2, 4, 64, 6, 288),              # small HD, larger chunk
        (2, 16, 64, 3, 288),             # prod Hkv, small chunk
        (64, 4, 64, 3, 288),             # failing shape at bench batch
    ]
    interpret = jax.default_backend() == "cpu"
    bad = 0
    for B, Hkv, D, sq, Sr in cases:
        for bb in (1, 8):
            err, rel = run_case(B, Hkv, D, sq, Sr, block_b=bb, interpret=interpret)
            status = "OK " if rel < 2e-3 else "BAD"
            bad += status == "BAD"
            print(
                f"[{status}] B={B} Hkv={Hkv} D={D} sq={sq} Sr={Sr} bb={bb}: "
                f"max_abs={err:.3e} rel={rel:.3e}",
                flush=True,
            )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
