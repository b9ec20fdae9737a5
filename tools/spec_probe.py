"""Forensic probe for the speculative-decode corruption seen on TRAINED WMs.

Two experiments, both with the trained wm_llama_small params
(tools/spec_accept_bench.py --params-cache):

1. rollout equality: greedy generate_sequences spec_k=K vs spec_k=0 must be
   bit-identical.  Run with JAX_PLATFORMS=cpu to separate logic bugs (CPU
   fails too) from TPU kernel numerics (CPU passes, TPU fails).

2. chunk-vs-step logits: prefill the prompt, then feed the SAME N tokens
   (a) one at a time with scalar cache_index and (b) as one chunk with a
   per-row vector cache_index (the spec verify call's configuration).  The
   per-position logits must match; prints max |delta| per position.

Usage:
  JAX_PLATFORMS=cpu python tools/spec_probe.py --params /tmp/wm_small_trained.npz
  python tools/spec_probe.py --params /tmp/wm_small_trained.npz   # TPU
"""
import argparse
import os

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
from vla_rft_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import dataclasses

import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig, generate_sequences

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from spec_accept_bench import make_batch, ACT_OFF


def load_params(wm, path):
    params = wm.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(data[f"p{i}"], l.dtype) for i, l in enumerate(leaves)]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/tmp/wm_small_trained.npz")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--spec-k", type=int, default=1)
    ap.add_argument("--ctx-len", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=4, help="probe-2 chunk length")
    ap.add_argument("--skip-rollout", action="store_true")
    args = ap.parse_args()

    cfg = TransformerConfig.wm_llama_small(vocab_size=9008, kv_cache_dtype="int8")
    wm = Decoder(cfg)
    params = load_params(wm, args.params)
    print(f"[params] loaded, backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(7)
    B, F, Vt, A = args.batch, args.frames, 64, 7
    ctx_len = args.ctx_len
    prompt_len = ctx_len + Vt + A
    seqs = make_batch(rng, B, ctx_len, F + 1, Vt, A, 0.1)
    prompt = jnp.asarray(seqs[:, :prompt_len], jnp.int32)
    actions = np.zeros((B, F + 1, A), np.int64)
    for f in range(F + 1):
        start = ctx_len + Vt + f * (Vt + A)
        if start + A <= seqs.shape[1]:
            actions[:, f] = seqs[:, start : start + A]
        else:
            actions[:, f] = rng.integers(ACT_OFF, ACT_OFF + 256, (B, A))
    actions = jnp.asarray(actions, jnp.int32)

    # ---------------- probe 2: chunk vs step logits on the same cache
    N = args.chunk
    toks = prompt[:, prompt_len - N :]  # feed the prompt tail twice
    head = prompt[:, : prompt_len - N]
    P0 = head.shape[1]
    cache = wm.init_cache(B, prompt_len + 8)
    _, _, cache = wm.apply(params, head, cache=cache, cache_index=0, logits_last_only=True)

    # (a) token-by-token, scalar index
    step_logits = []
    c_a = cache
    for i in range(N):
        lg, _, c_a = wm.apply(params, toks[:, i : i + 1], cache=c_a, cache_index=P0 + i)
        step_logits.append(np.asarray(lg[:, 0], np.float32))
    # (b) one chunk, per-row vector index (spec verify configuration)
    pos0 = jnp.full((B,), P0, jnp.int32)
    lg_b, _, c_b = wm.apply(
        params, toks, cache=cache, cache_index=pos0, kv_lens=pos0 + N
    )
    lg_b = np.asarray(lg_b, np.float32)
    # (c) one chunk, scalar index
    lg_c, _, _ = wm.apply(params, toks, cache=cache, cache_index=P0)
    lg_c = np.asarray(lg_c, np.float32)

    for i in range(N):
        da = np.abs(lg_b[:, i] - step_logits[i]).max()
        dc = np.abs(lg_c[:, i] - step_logits[i]).max()
        am_match_b = (lg_b[:, i].argmax(-1) == step_logits[i].argmax(-1)).mean()
        am_match_c = (lg_c[:, i].argmax(-1) == step_logits[i].argmax(-1)).mean()
        print(
            f"[probe2 pos {i}] |chunk(vec) - step|max {da:.4f} argmax-match {am_match_b:.2f}"
            f" | |chunk(scalar) - step|max {dc:.4f} argmax-match {am_match_c:.2f}",
            flush=True,
        )
    # cache content comparison after the writes (first layer K)
    ka = np.asarray(c_a[0], np.int32)
    kb = np.asarray(c_b[0], np.int32)
    print(f"[probe2 cache] K int8 equal: {(ka == kb).mean():.4f}", flush=True)

    # ---------------- probe 3: causal-leak test — output 0 of a verify chunk
    # must be bit-invariant to the draft token fed at chunk position 1.
    t0 = toks[:, :1]
    for alt in (1, 2):
        ch_x = jnp.concatenate([t0, toks[:, 1:2]], axis=1)
        ch_y = jnp.concatenate([t0, (toks[:, 1:2] + alt * 17) % 9008], axis=1)
        lx, _, _ = wm.apply(params, ch_x, cache=cache, cache_index=pos0[:, None][:, 0], kv_lens=pos0 + 2)
        ly, _, _ = wm.apply(params, ch_y, cache=cache, cache_index=pos0[:, None][:, 0], kv_lens=pos0 + 2)
        d0 = np.abs(np.asarray(lx[:, 0], np.float32) - np.asarray(ly[:, 0], np.float32)).max()
        am = (np.asarray(lx[:, 0]).argmax(-1) == np.asarray(ly[:, 0]).argmax(-1)).mean()
        print(f"[probe3 alt={alt}] |out0(X) - out0(Y)|max {d0:.6f} argmax-match {am:.2f}", flush=True)

    # probe 4: spec-style acceptance statistic outside the rollout loop.
    # Step-decode N tokens greedily from the prompt; at each position ALSO run
    # a verify chunk [pending, draft(prev-frame tok)] and compare argmax(out0)
    # with the step argmax (must be equal if no leak), and with the draft.
    Nacc = 32
    c_d = cache
    pend = jnp.argmax(step_logits[-1] if step_logits else np.asarray(lg_c[:, -1]), axis=-1)
    pend = jnp.asarray(pend, jnp.int32)
    # rebuild: decode from end of prompt
    c_d = c_b  # cache holding the full prompt (chunk-written tail, fine)
    pos = P0 + N
    last = jnp.asarray(lg_b[:, -1])
    agree = 0
    acc_spec = 0
    acc_true = 0
    for i in range(Nacc):
        tok = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]
        draft = prompt[:, (pos + 1 - (Vt + A)) % prompt.shape[1]][:, None]
        chunk2 = jnp.concatenate([tok, draft], axis=1)
        posv = jnp.full((B,), pos, jnp.int32)
        lgc, _, _ = wm.apply(params, chunk2, cache=c_d, cache_index=posv, kv_lens=posv + 2)
        # step write (scalar)
        lgs, _, c_d = wm.apply(params, tok, cache=c_d, cache_index=pos)
        a_step = np.asarray(lgs[:, 0]).argmax(-1)
        a_chunk = np.asarray(lgc[:, 0]).argmax(-1)
        agree += (a_step == a_chunk).mean() / Nacc
        acc_spec += (a_chunk == np.asarray(draft[:, 0])).mean() / Nacc
        acc_true += (a_step == np.asarray(draft[:, 0])).mean() / Nacc
        last = lgs[:, 0]
        pos += 1
    print(
        f"[probe4] chunk-vs-step argmax agree {agree:.3f}; acceptance(chunk) "
        f"{acc_spec:.3f} vs acceptance(step) {acc_true:.3f}", flush=True,
    )

    if args.skip_rollout:
        return

    # ---------------- probe 1: greedy rollout equality
    roll = WMRolloutConfig(
        prompt_length=prompt_len,
        response_length=F * (Vt + A),
        num_frames=F,
        interact_max_tokens=Vt,
        do_sample=False,
        temperature=1.0,
        cache_segments=1,
    )
    outs = {}
    for k in (0, args.spec_k):
        rc = dataclasses.replace(roll, speculative_k=k)
        fn = jax.jit(
            lambda p, r, ids, acts, rc=rc: generate_sequences(wm, p, r, ids, acts, rc)
        )
        outs[k] = np.asarray(fn(params, jax.random.key(99), prompt, actions))
        vis = outs[k].reshape(B, F, Vt + A)[:, :, :Vt]
        prev = np.concatenate(
            [np.asarray(prompt[:, ctx_len : ctx_len + Vt])[:, None], vis[:, :-1]],
            axis=1,
        )
        print(f"[rollout spec_k={k}] prev-frame match {(vis == prev).mean():.3f}", flush=True)
    eq = (outs[0] == outs[args.spec_k]).mean()
    # where does divergence start?
    neq = outs[0] != outs[args.spec_k]
    first = [int(np.argmax(neq[b])) if neq[b].any() else -1 for b in range(B)]
    print(f"[rollout] greedy equality {eq:.4f}; first-divergence col per row: {first}", flush=True)


if __name__ == "__main__":
    main()
