"""Reward-stage microbench: decomposes msp_reward into detokenize vs LPIPS
vs recon at real LIBERO shapes (256x256, 8 frames).

Usage: PYTHONPATH=. python tools/reward_bench.py [--seqs 8] [--chunks 4]
  --seqs: sequences per jit call (tokenizer_micro_batch_size analog)
"""
import argparse
import time

import jax
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.lpips import LPIPS
from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ
from vla_rft_tpu.workers.processor import ProcessorConfig
from vla_rft_tpu.workers.reward import RewardConfig, msp_reward


def _rand_params(mod, *args, method=None):
    kw = {"method": method} if method else {}
    shapes = jax.eval_shape(lambda r: mod.init(r, *args, **kw), jax.random.key(0))
    rng = np.random.default_rng(0)

    def mat(path, sd):
        name = str(getattr(path[-1], "key", path[-1])).lower()
        if name in ("weight", "scale"):
            return jnp.ones(sd.shape, sd.dtype)
        if name == "bias":
            return jnp.zeros(sd.shape, sd.dtype)
        return jnp.asarray(
            rng.standard_normal(size=sd.shape, dtype=np.float32) * 0.02, sd.dtype
        )

    return jax.tree_util.tree_map_with_path(mat, shapes)


def timed(fn, *args, n=3, label=""):
    t0 = time.time()
    out = jax.tree_util.tree_map(np.asarray, fn(*args))
    print(f"[{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        ts.append(time.time() - t0)
    print(f"[{label}] best {min(ts)*1e3:.0f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, F = args.seqs, args.frames
    tok = CompressiveVQModelFSQ(dtype=dt)
    lp = LPIPS(dtype=dt)
    proc = ProcessorConfig()
    rcfg = RewardConfig(num_frames=F)

    rng = np.random.default_rng(0)
    idx_c = jnp.asarray(rng.integers(0, 4375, (B, 1, 1024)), jnp.int32)
    vis = jnp.asarray(rng.integers(0, 4375, (B, F, 64)), jnp.int32)
    real = jnp.asarray(rng.random((B, F, 256, 256, 3), np.float32))
    responses = jnp.zeros((B, F * 71), jnp.int32)  # layout only; vis fed directly

    tok_params = _rand_params(tok, idx_c[:1], vis[:1, :1], method=tok.detokenize)
    img1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    lp_params = _rand_params(lp, img1, img1)

    # reduce to a scalar ON DEVICE: returning the (B,F,256,256,3) pixels
    # would time the host relay transfer (~56MB), not the decode
    detok_sum = jax.jit(
        lambda p, c, v: tok.apply(p, c, v, method=tok.detokenize).mean()
    )
    timed(detok_sum, tok_params, idx_c, vis, label=f"detokenize B={B} F={F}")
    for f in (1, 4):
        timed(
            detok_sum, tok_params, idx_c, vis[:, :f],
            label=f"detokenize B={B} F={f}",
        )
    detok = jax.jit(lambda p, c, v: tok.apply(p, c, v, method=tok.detokenize))
    pred = detok(tok_params, idx_c, vis)
    pred = jnp.clip(jnp.asarray(pred)[:, 1:], 0, 1)

    lpips_fn = jax.jit(
        lambda p, a, b: lp.apply(
            p, a.reshape(-1, 256, 256, 3) * 2 - 1, b.reshape(-1, 256, 256, 3) * 2 - 1
        ).mean()
    )
    timed(lpips_fn, lp_params, real, pred, label=f"lpips {B*F} pairs")

    recon = jax.jit(lambda a, b: jnp.mean(jnp.abs(a - b), axis=(2, 3, 4)))
    timed(recon, real, pred, label="recon mae")

    # full msp_reward with the gt branch (two detokenizes) — trainer shape
    full = jax.jit(
        lambda tp, lpp, r, c, g: msp_reward(
            tok, tp, lp, lpp, proc, rcfg, r, c, gt_responses=g
        )
    )
    resp = jnp.asarray(rng.integers(0, 4375, (B, F * 71)), jnp.int32)
    gtr = jnp.asarray(rng.integers(0, 4375, (B, F * 71)), jnp.int32)
    timed(full, tok_params, lp_params, resp, idx_c + 4375, gtr,
          label=f"msp_reward(gt) B={B}")

    # precomputed-ctx-feats path (trainer: ctx decoded once per unique)
    ctx_map = jnp.zeros((B,), jnp.int32)
    feats_fn = jax.jit(
        lambda tp, c: tok.apply(tp, c, method=tok.ctx_decode)[1]
    )
    feats_u = feats_fn(tok_params, idx_c[:1])
    full_feats = jax.jit(
        lambda tp, lpp, r, fu, g: msp_reward(
            tok, tp, lp, lpp, proc, rcfg, r, None, gt_responses=g,
            ctx_feats=fu, ctx_map=ctx_map,
        )
    )
    timed(full_feats, tok_params, lp_params, resp, feats_u, gtr,
          label=f"msp_reward(gt,feats) B={B}")


if __name__ == "__main__":
    main()
