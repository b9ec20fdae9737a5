"""Hunt for per-decode-step copies of the KV cache in compiled HLO.

The round-2 bench left wm_rollout at 4.15s/step vs a ~1.4s DMA+weight floor.
One hypothesis that fits the excess (~4.5GB/step of unexplained HBM traffic)
is that XLA fails to alias the cache through the token-scan carry and copies
it every step.  This tool compiles generate_sequences (CPU backend — weak but
indicative evidence; the TPU compiler makes its own aliasing choices) and
reports every `copy`/`scatter` instruction whose shape matches a cache arm,
grouped by enclosing computation, so loop-body copies stand out.

Usage: JAX_PLATFORMS=cpu python tools/hlo_copy_hunt.py [--shared] [--spec K]
"""
import argparse
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig, generate_sequences


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shared", action="store_true", help="split-cache path")
    ap.add_argument("--spec", type=int, default=0)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--segments", type=int, default=2)
    args = ap.parse_args()

    cfg = TransformerConfig.wm_llama(
        num_layers=args.layers, kv_cache_dtype="int8", weights_int8=False
    )
    wm = Decoder(cfg)
    B, F, V, A = args.batch, args.frames, 64, 7
    ctx = 128
    P = ctx + V + A
    roll = WMRolloutConfig(
        prompt_length=P, response_length=F * (V + A), num_frames=F,
        interact_max_tokens=V, cache_segments=args.segments,
        speculative_k=args.spec,
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 4375, (B, P)), jnp.int32)
    actions = jnp.asarray(rng.integers(8750, 9006, (B, F + 1, A)), jnp.int32)
    params = jax.eval_shape(lambda: wm.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    kw = {}
    if args.shared:
        n = 4  # rollouts per unique sample
        shared_prefix = prompt[:: n, : P - A]
        prefix_map = jnp.repeat(jnp.arange(B // n, dtype=jnp.int32), n)
        own = prompt[:, P - A:]
        fn = jax.jit(
            lambda p, r, own, acts, sp, pm: generate_sequences(
                wm, p, r, own, acts, roll, shared_prefix=sp, prefix_map=pm
            )
        )
        lowered = fn.lower(params, jax.random.key(1), own, actions, shared_prefix, prefix_map)
    else:
        fn = jax.jit(lambda p, r, ids, acts: generate_sequences(wm, p, r, ids, acts, roll))
        lowered = fn.lower(params, jax.random.key(1), prompt, actions)

    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"[hlo] {len(hlo.splitlines())} lines", file=sys.stderr)

    # cache arm shapes we care about: s8[L,B,H,S,D] (k/v) and bf16[L,B,H,S] scales
    L = args.layers
    cache_pat = re.compile(rf"s8\[{L},\d+,\d+,\d+,\d+\]")
    scale_pat = re.compile(rf"bf16\[{L},\d+,\d+,\d+\]")

    cur_comp = "?"
    hits = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s*\([^)]*\)\s*->", line)
        if line.strip().startswith(("ENTRY", "%")) and "{" in line and "->" in line:
            cm = re.search(r"%?([\w\.\-]+)\s*\(", line)
            if cm:
                cur_comp = cm.group(1)
        ls = line.strip()
        op = ls.split("=")[-1].strip().split("(")[0].strip() if "=" in ls else ""
        for kind in ("copy", "scatter", "dynamic-update-slice", "concatenate", "pad"):
            if re.search(rf"=\s*\S+\s+{kind}\(", ls) or f" {kind}(" in ls:
                if cache_pat.search(ls) or scale_pat.search(ls):
                    key = (cur_comp, kind)
                    hits[key] = hits.get(key, 0) + 1
    print("\ncache-shaped ops by (computation, kind):")
    for (comp, kind), n in sorted(hits.items()):
        tag = "  <-- LOOP BODY" if ("while" in comp or "body" in comp or "scan" in comp) else ""
        print(f"  {comp:60s} {kind:22s} x{n}{tag}")
    ncopy = sum(n for (c, k), n in hits.items() if k == "copy")
    print(f"\ntotal cache-shaped copies: {ncopy}")


if __name__ == "__main__":
    main()
