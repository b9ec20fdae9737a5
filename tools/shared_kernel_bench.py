"""Split-cache decode kernel bench at trainer shapes.

Times decode_attention_shared inside a jitted scan (DESIGN_NOTES measurement
discipline) at the RFT trainer's WM shapes: B rollout rows sharing B_u unique
prompt prefixes, int8 packed cache, Sp=1152 shared prefix + Sr own tail.

Usage: python tools/shared_kernel_bench.py [--batch 128] [--uniques 4]
    [--sr 640] [--bb 1 2 4 8] [--rowloop]
"""
import argparse
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.ops.decode_attention import decode_attention_shared

L, HKV, D, G = 24, 16, 64, 1


def run(B, B_u, Sr, Sp, bb, n_steps=48, rowloop=None):
    rng = np.random.default_rng(0)
    Hc, Dc = HKV // 2, 2 * D
    ck = jnp.asarray(rng.integers(-127, 127, (L, B, Hc, Sr, Dc)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 127, (L, B, Hc, Sr, Dc)), jnp.int8)
    sck = jnp.asarray(rng.integers(-127, 127, (L, B_u, Hc, Sp, Dc)), jnp.int8)
    scv = jnp.asarray(rng.integers(-127, 127, (L, B_u, Hc, Sp, Dc)), jnp.int8)
    scales = (
        jnp.full((L, B, HKV, Sr), 0.01, jnp.bfloat16),
        jnp.full((L, B, HKV, Sr), 0.01, jnp.bfloat16),
    )
    sscales = (
        jnp.full((L, B_u, HKV, Sp), 0.01, jnp.bfloat16),
        jnp.full((L, B_u, HKV, Sp), 0.01, jnp.bfloat16),
    )
    q = jnp.asarray(rng.normal(size=(B, 1, HKV * G, D)), jnp.bfloat16)
    kv_lens = jnp.full((B,), Sr, jnp.int32)
    pm = jnp.asarray(np.arange(B) * B_u // B, jnp.int32)

    kw = dict(block_b=bb)
    if rowloop is not None:
        kw["row_chunk"] = rowloop

    @jax.jit
    def many(q, ck, cv, sck, scv, scales, sscales):
        def step(acc, i):
            out = decode_attention_shared(
                q + acc, ck, cv, sck, scv, i % L, kv_lens, pm, Sp,
                scales=scales, shared_scales=sscales, **kw,
            )
            return acc + out.mean() * 1e-9, None

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.bfloat16), jnp.arange(n_steps))
        return acc

    t0 = time.time()
    np.asarray(many(q, ck, cv, sck, scv, scales, sscales))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(many(q, ck, cv, sck, scv, scales, sscales))
        ts.append(time.time() - t0)
    per_call = min(ts) / n_steps
    own_bytes = 2 * L * B * Hc * Sr * Dc + 2 * L * B * HKV * Sr * 2
    sh_bytes = 2 * L * B_u * Hc * Sp * Dc + 2 * L * B_u * HKV * Sp * 2
    bw = (own_bytes + sh_bytes) / per_call / 1e9
    tag = f"rc={rowloop}" if rowloop else "rc=auto"
    print(
        f"[{tag} bb={bb} B={B} Sr={Sr}] {per_call*1e6:7.1f} us/call "
        f"({(own_bytes+sh_bytes)/1e6:.0f} MB -> {bw:.0f} GB/s) (compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--uniques", type=int, default=4)
    ap.add_argument("--sr", type=int, default=640)
    ap.add_argument("--sp", type=int, default=1152)
    ap.add_argument("--bb", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--rc", type=int, default=None, help="row_chunk override")
    args = ap.parse_args()
    for bb in args.bb:
        run(args.batch, args.uniques, args.sr, args.sp, bb, rowloop=args.rc)


if __name__ == "__main__":
    main()
