"""int8-vs-bf16 MXU throughput at the reward-stage decoder's GEMM shapes.

VERDICT r3 item 6 asks whether int8 decoder convs would lift the adv-stage
ceiling (the conv decoder measured at ~60-65% of v5e bf16 peak,
DESIGN_NOTES "reward stage status").  The original tools/int8_conv_probe.py
could never compile: the remote tunnel compiles ANY fresh conv HLO in ~270s
(tools/rft_evidence.py measurement), and the probe needs many.  This probe
asks the same hardware question without conv ops: a KxN conv is the im2col
GEMM (M, 9*Cin) x (9*Cin, Cout), so int8/bf16 DOT throughput at those GEMM
shapes IS the conv MXU ceiling ratio.  Matmuls compile in seconds.

Shapes: the CompressiveVQModelFSQ decoder at LIBERO detokenize
(tokenizer_micro_batch_size 8 rows x 8 frames, upsample 32^2 -> 256^2,
channels 512 -> 128); M = frames*H*W, K = 9*Cin, N = Cout.

Prints one JSON line with per-shape times and the int8 speedup ratio.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vla_rft_tpu.utils.cache import enable_compilation_cache

REPS = 8  # dependent matmuls per timed dispatch (tunnel-safe: one download)

# (tag, M, K, N) — decoder up-stages at 64-frame detokenize chunks
SHAPES = [
    ("up0_32x32_c512", 64 * 32 * 32, 9 * 512, 512),
    ("up1_64x64_c512", 64 * 64 * 64, 9 * 512, 256),
    ("up2_128x128_c256", 64 * 128 * 128, 9 * 256, 128),
    ("up3_256x256_c128", 16 * 256 * 256, 9 * 128, 128),  # 16 frames: HBM
]


def bench(fn, *args, reps=3):
    float(fn(*args))  # compile + settle
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    return (time.time() - t0) / reps / REPS


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    rows = []
    for tag, M, K, N in SHAPES:
        xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

        # Loop closure: each iteration perturbs W with a (K,1) column derived
        # from the previous product, so iterations are DATA-dependent (XLA
        # cannot elide or parallelize them) while the perturbation write is
        # only K*N — the big (M,K) operand stays untouched in HBM.  The
        # perturbation is numerically ~0 (bf16 underflow / int division) but
        # the compiler can't prove that.
        @jax.jit
        def mm_bf16(x, w):
            def body(r, _):
                y = jax.lax.dot(x, w + r, preferred_element_type=jnp.float32)
                # full-product reduction (fuses into the dot epilogue) so XLA
                # can't narrow the dot to the slice the carry needs
                s = jnp.sum(y) * 1e-30
                r2 = jnp.broadcast_to(s[None, None], (K, 1)).astype(w.dtype)
                return r2, None

            r, _ = jax.lax.scan(
                body, jnp.zeros((K, 1), w.dtype), None, length=REPS
            )
            return jnp.sum(r.astype(jnp.float32))

        @jax.jit
        def mm_int8(x, w):
            def body(r, _):
                y = jax.lax.dot(x, w + r, preferred_element_type=jnp.int32)
                s = jnp.sum(y.astype(jnp.float32)) * 1e-30
                r2 = s[None, None].astype(jnp.int8)
                return jnp.broadcast_to(r2, (K, 1)), None

            r, _ = jax.lax.scan(
                body, jnp.zeros((K, 1), jnp.int8), None, length=REPS
            )
            return jnp.sum(r.astype(jnp.int32))

        tb = bench(mm_bf16, xb, wb)
        ti = bench(mm_int8, x8, w8)
        flops = 2 * M * K * N
        rows.append(
            {
                "shape": tag,
                "gemm": [M, K, N],
                "bf16_ms": round(tb * 1e3, 3),
                "int8_ms": round(ti * 1e3, 3),
                "bf16_tflops": round(flops / tb / 1e12, 1),
                "int8_tops": round(flops / ti / 1e12, 1),
                "int8_speedup": round(tb / ti, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    mean_speedup = float(np.mean([r["int8_speedup"] for r in rows]))
    print(
        json.dumps(
            {
                "metric": "decoder_gemm_int8_speedup",
                "value": round(mean_speedup, 2),
                "rows": rows,
                "note": "im2col-GEMM formulation of the detokenize decoder convs",
            }
        )
    )


if __name__ == "__main__":
    main()
