"""Decode-attention kernel bench: isolates per-call overhead vs bandwidth.

Times N kernel calls inside one jitted lax.scan (per DESIGN_NOTES
measurement discipline) across cache lengths S; the S->0 intercept is the
fixed per-call overhead, the slope is achieved HBM bandwidth.

Usage: python tools/decode_kernel_bench.py [--batch 64] [--lens 128 512 1664]
"""
import argparse
import functools
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.ops.decode_attention import decode_attention

L, HKV, D, G = 24, 16, 64, 1


def run(B, S, n_steps=64, quantized=True, packed=True):
    rng = np.random.default_rng(0)
    Hc, Dc = (HKV // 2, 2 * D) if packed else (HKV, D)
    dt = jnp.int8 if quantized else jnp.bfloat16
    ck = jnp.asarray(rng.integers(-127, 127, (L, B, Hc, S, Dc)), dt)
    cv = jnp.asarray(rng.integers(-127, 127, (L, B, Hc, S, Dc)), dt)
    scales = None
    if quantized:
        sk = jnp.full((L, B, HKV, S), 0.01, jnp.bfloat16)
        sv = jnp.full((L, B, HKV, S), 0.01, jnp.bfloat16)
        scales = (sk, sv)
    q = jnp.asarray(rng.normal(size=(B, 1, HKV * G, D)), jnp.bfloat16)
    kv_lens = jnp.full((B,), S, jnp.int32)

    @jax.jit
    def many(q, ck, cv, scales):
        def step(acc, i):
            out = decode_attention(q + acc, ck, cv, i % L, kv_lens, scales=scales)
            return acc + out.mean() * 1e-9, None

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.bfloat16), jnp.arange(n_steps))
        return acc

    t0 = time.time()
    np.asarray(many(q, ck, cv, scales))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(many(q, ck, cv, scales))
        ts.append(time.time() - t0)
    per_call = min(ts) / n_steps
    kv_bytes = 2 * L * B * Hc * S * Dc * np.dtype(dt).itemsize
    sc_bytes = 2 * L * B * HKV * S * 2 if quantized else 0
    bw = (kv_bytes + sc_bytes) / per_call / 1e9
    print(
        f"[S={S:5d} B={B}] {per_call*1e6:7.1f} us/call  "
        f"kv+scales {(kv_bytes+sc_bytes)/1e6:7.1f} MB  -> {bw:6.1f} GB/s  "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_call, kv_bytes + sc_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lens", type=int, nargs="+", default=[128, 512, 1664])
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    pts = [run(args.batch, s, quantized=not args.bf16) for s in args.lens]
    if len(pts) >= 2:
        (t0, b0), (t1, b1) = pts[0], pts[-1]
        bw = (b1 - b0) / (t1 - t0) / 1e9
        ovh = t0 - b0 / bw / 1e9 * 1e9  # extrapolated S->0 intercept
        print(f"marginal bandwidth {bw:.1f} GB/s; fixed per-call overhead ~{ovh*1e6:.1f} us")


if __name__ == "__main__":
    main()
