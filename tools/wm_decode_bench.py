"""WM decode microbench: isolates the wm_rollout stage (the RFT step's
dominant cost) at real LIBERO shapes so decode optimizations can be measured
without building/compiling the full trainer.

Usage: python tools/wm_decode_bench.py [--segs 1 4] [--batch 64]
"""
import argparse
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import dataclasses

import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig, generate_sequences


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segs", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--block-b", type=int, default=1)
    ap.add_argument("--kv-layout", default="hd", choices=["hd", "heads"])
    ap.add_argument("--profile", default="", help="capture a jax.profiler trace of one timed rollout to this dir")
    ap.add_argument("--weights-int8", action="store_true")
    ap.add_argument(
        "--no-fused", action="store_true",
        help="force the flax per-op decode path (A/B: fused pallas layer "
        "kernels vs XLA op-by-op at the SAME layout/dtype)",
    )
    ap.add_argument("--spec-k", type=int, default=0)
    ap.add_argument(
        "--uniques", type=int, default=0,
        help="shared-prefix prefill with this many unique prompt heads (0 = off)",
    )
    args = ap.parse_args()

    cfg = TransformerConfig.wm_llama(
        kv_cache_dtype=args.kv_dtype, decode_block_b=args.block_b,
        kv_layout=args.kv_layout,
    )
    wm = Decoder(cfg)
    roll = WMRolloutConfig()

    t0 = time.time()
    shapes = jax.eval_shape(
        lambda r: wm.init(r, jnp.zeros((1, 8), jnp.int32)), jax.random.key(0)
    )
    nprng = np.random.default_rng(0)

    def materialize(path, sd):
        name = str(getattr(path[-1], "key", path[-1])).lower()
        if name in ("weight", "scale"):
            return jnp.ones(sd.shape, sd.dtype)
        arr = nprng.standard_normal(size=sd.shape, dtype=np.float32) * np.float32(0.02)
        return jnp.asarray(arr, sd.dtype)

    params = jax.tree_util.tree_map_with_path(materialize, shapes)
    print(f"[init params] {time.time()-t0:.1f}s", flush=True)

    if args.weights_int8:
        import dataclasses as _dc

        from vla_rft_tpu.models.transformer import quantize_decoder_params

        params = quantize_decoder_params(params, cfg)
        cfg = _dc.replace(cfg, weights_int8=True)
        wm = Decoder(cfg)
        print("[weights quantized to int8]", flush=True)

    B = args.batch
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 9006, (B, roll.prompt_length)), jnp.int32)
    actions = jnp.asarray(
        rng.integers(8750, 9006, (B, roll.num_frames + 1, roll.action_dim)), jnp.int32
    )

    p0 = roll.prompt_length - roll.action_dim
    for n_seg in args.segs:
        rc = dataclasses.replace(
            roll, cache_segments=n_seg, speculative_k=args.spec_k,
            fused_layers=not args.no_fused,
        )

        if args.uniques:
            nu = args.uniques
            pm = jnp.asarray(np.arange(nu).repeat(B // nu), jnp.int32)

            @jax.jit
            def gen(params, key, prompt, actions, rc=rc, pm=pm, nu=nu):
                return generate_sequences(
                    wm, params, key, prompt[:, p0:], actions, rc,
                    shared_prefix=prompt[:: B // nu, :p0], prefix_map=pm,
                    prefix_run=B // nu,
                )
        else:

            @jax.jit
            def gen(params, key, prompt, actions, rc=rc):
                return generate_sequences(wm, params, key, prompt, actions, rc)

        tag = f"segs={n_seg}" + (f" uniq={args.uniques}" if args.uniques else "")
        t0 = time.time()
        out = np.asarray(gen(params, jax.random.key(0), prompt, actions))
        print(f"[{tag}] compile+first: {time.time()-t0:.1f}s", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            out = np.asarray(gen(params, jax.random.key(i + 1), prompt, actions))
            times.append(time.time() - t0)
        if args.profile:
            with jax.profiler.trace(args.profile):
                np.asarray(gen(params, jax.random.key(9), prompt, actions))
            print(f"[profile] trace written to {args.profile}", flush=True)
        best = min(times)
        fps = B * roll.num_frames / best
        # decode-stage MFU (VERDICT r3 item 2): model FLOPs of every emitted
        # position (prefill tokens at their true seqlen + each decoded token
        # at its cache length) / best time / bf16 peak.  Decode is expected
        # to be HBM-bound, so also report cache-read bandwidth utilization.
        from vla_rft_tpu.utils.flops_counter import FlopsCounter

        fc = FlopsCounter(cfg)
        S0 = roll.prompt_length
        n_dec = roll.num_frames * (roll.interact_max_tokens + roll.action_dim)
        tok_flops = B * (
            sum(fc.flops_per_token(s) for s in range(1, S0 + 1))
            + sum(fc.flops_per_token(S0 + i) for i in range(1, n_dec + 1))
        )
        mfu = tok_flops / best / fc.peak
        kv_bytes = 1 if args.kv_dtype == "int8" else 2
        total_len = S0 + n_dec
        # each decode step re-reads the valid cache prefix (k+v) per layer
        cache_reads = (
            B * cfg.num_layers * 2 * cfg.num_kv_heads * cfg.hd * kv_bytes
            * sum(S0 + i for i in range(n_dec))
        )
        hbm_util = cache_reads / best / 400e9  # practical v5e roofline
        print(
            f"[{tag}] B={B} best {best:.2f}s  "
            f"{best/ (roll.num_frames*(roll.interact_max_tokens+1))*1e3:.2f} ms/step  "
            f"{fps:.1f} frames/s  mfu {mfu:.4f}  cache-read bw util {hbm_util:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
