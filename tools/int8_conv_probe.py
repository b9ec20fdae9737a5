"""Probe: does XLA:TPU lower int8 convolutions to the MXU int8 path?

Gates the int8-detokenizer idea (reward stage: conv decoder ~0.45 TF/frame
at 50-65% bf16 MXU; int8 would double the ceiling and halve activation
traffic).  Times lax.conv_general_dilated at decoder-representative NHWC
shapes in bf16 vs int8(->int32).  If int8 isn't ~1.5x+ faster, the decoder
quantization project is dead on this hardware/compiler and we skip it.

Usage: python tools/int8_conv_probe.py   (on the real chip)
"""
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


REPS = 16  # conv applications per timed dispatch


def bench(fn, *args, reps=3):
    """Times fn (which runs REPS dependent convs in ONE jit and reduces to a
    scalar) — per-call downloads through the ~1.2MB/s tunnel poison any
    benchmark that materializes a full tensor per rep."""
    float(fn(*args))  # compile + settle
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    return (time.time() - t0) / reps / REPS


def main():
    rng = np.random.default_rng(0)
    # (batch, hw, cin, cout): decoder up-stages at 16-frame micro-chunks
    shapes = [(16, 64, 512, 512), (16, 128, 256, 256), (16, 256, 128, 128)]
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))
    for B, HW, CI, CO in shapes:
        x = rng.standard_normal((B, HW, HW, CI), np.float32)
        w = rng.standard_normal((3, 3, CI, CO), np.float32) * 0.05
        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(np.round(x * 20), -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(np.round(w * 500), -127, 127), jnp.int8)

        @jax.jit
        def conv_bf16(x, w):
            def body(h, _):
                y = jax.lax.conv_general_dilated(
                    h, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                # renormalize so the chain stays finite (dependent -> the
                # compiler cannot elide any iteration)
                return (y * jnp.float32(0.01)).astype(jnp.bfloat16), None

            h, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(h.astype(jnp.float32))

        @jax.jit
        def conv_int8(x, w):
            def body(h, _):
                y = jax.lax.conv_general_dilated(
                    h, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                return jnp.clip(y // 128, -127, 127).astype(jnp.int8), None

            h, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(h.astype(jnp.int32))

        tb = bench(conv_bf16, xb, wb)
        ti = bench(conv_int8, x8, w8)
        fl = 2 * B * HW * HW * CI * CO * 9
        print(
            f"B{B} {HW}x{HW} {CI}->{CO}: bf16 {tb*1e3:.2f}ms ({fl/tb/1e12:.0f} TF/s)"
            f"  int8 {ti*1e3:.2f}ms ({fl/ti/1e12:.0f} TOP/s)  speedup {tb/ti:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
