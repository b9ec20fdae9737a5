"""Export trained flax params back to HF/torch layouts.

TPU-native analog of the reference's checkpoint merger
(train/verl/scripts/model_merger.py: collect sharded FSDP/megatron state
dicts back into a HuggingFace model directory): orbax checkpoints are
already logically unsharded, so export is a pure layout conversion — the
inverse of tools/convert_weights.py.  Lets a trained WM / policy LLM be
loaded by HF `from_pretrained` (and the reference's own eval tooling).

Usage:
  # action expert (what RFT checkpoints actually train/save):
  python tools/export_weights.py expert --ckpt <global_step_N dir> \
      --collection expert --out action_expert.pt
  # a decoder (WM / policy LLM) from a flax .npz export:
  python tools/export_weights.py decoder --ckpt wm.npz --arch wm_llama \
      --out wm_hf.pt
"""
from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_hf_decoder(params: Dict[str, Any], cfg, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Decoder flax params -> HF LlamaForCausalLM/Qwen2ForCausalLM state dict.

    Inverse of convert_weights.convert_hf_decoder: unstacks the nn.scan
    layer axis, transposes DenseGeneral kernels back to (out, in), and
    re-fuses (in, heads, hd) attention projections to (heads*hd, in).
    """
    p = params["params"] if "params" in params else params
    L, D = cfg.num_layers, cfg.hidden_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    layers = p["layers"]
    sd: Dict[str, np.ndarray] = {}

    sd[prefix + "embed_tokens.weight"] = _np(p["embed_tokens"]["embedding"])
    sd[prefix + "norm.weight"] = _np(p["norm"]["weight"])
    if "lm_head" in p:
        sd["lm_head.weight"] = _np(p["lm_head"]["kernel"]).T

    attn = layers["self_attn"]
    mlp = layers["mlp"]
    for i in range(L):
        lp = f"{prefix}layers.{i}."
        sd[lp + "input_layernorm.weight"] = _np(layers["input_layernorm"]["weight"][i])
        sd[lp + "post_attention_layernorm.weight"] = _np(
            layers["post_attention_layernorm"]["weight"][i]
        )
        for name, n in (("q_proj", nh), ("k_proj", nkv), ("v_proj", nkv)):
            w = _np(attn[name]["kernel"][i])  # (D, n, hd)
            sd[lp + f"self_attn.{name}.weight"] = w.reshape(D, n * hd).T
            if "bias" in attn[name]:
                sd[lp + f"self_attn.{name}.bias"] = _np(attn[name]["bias"][i]).reshape(
                    n * hd
                )
        o = _np(attn["o_proj"]["kernel"][i])  # (nh, hd, D)
        sd[lp + "self_attn.o_proj.weight"] = o.reshape(nh * hd, D).T
        for name in ("gate_proj", "up_proj", "down_proj"):
            sd[lp + f"mlp.{name}.weight"] = _np(mlp[name]["kernel"][i]).T
    return sd


def export_action_expert(params: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """ActionExpert flax params -> the reference's component state dicts
    (action_head / sigma_net / proprio_projector / noisy_action_projector,
    the files openvla_utils.load_component_state_dict reads).

    Inverse of convert_weights.convert_action_expert at the tree level:
    flax Dense kernels (in, out) -> torch Linear (out, in).  DiT internals
    keep the flax nesting flattened with dots; exact reference key names for
    the DiT internals depend on its module code, so this export targets
    round-tripping through convert_weights (dense/layernorm handling is
    exact) rather than byte-level key parity.
    """
    p = params["params"] if "params" in params else params

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                a = _np(v)
                if k == "kernel":
                    a = a.T if a.ndim == 2 else a
                out[key] = a
        return out

    return {name: flatten(sub) for name, sub in p.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["decoder", "expert"])
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir or .npz")
    ap.add_argument("--arch", default="wm_llama", help="wm_llama|wm_llama_small|qwen25_0_5b")
    ap.add_argument("--collection", default=None, help="params sub-tree name (e.g. wm)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=None)
    args = ap.parse_args()

    from vla_rft_tpu.models.transformer import TransformerConfig

    if args.ckpt.endswith(".npz"):
        flat = dict(np.load(args.ckpt))
        params: Dict[str, Any] = {}
        for k, v in flat.items():
            node = params
            parts = k.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = v
    else:
        # orbax checkpoint dir (a trainer step_dir or its 'state' subdir)
        import orbax.checkpoint as ocp

        path = args.ckpt
        if not path.rstrip("/").endswith("state"):
            import os

            cand = os.path.join(path, "state")
            path = cand if os.path.isdir(cand) else path
        state = ocp.StandardCheckpointer().restore(path)
        params = state.get("params", state)
    if args.collection:
        params = params[args.collection]

    if args.what == "decoder":
        kw = {"vocab_size": args.vocab_size} if args.vocab_size else {}
        cfg = getattr(TransformerConfig, args.arch)(**kw)
        sd = export_hf_decoder(params, cfg)
    else:
        comp = export_action_expert(params)
        sd = {f"{c}.{k}": v for c, t in comp.items() for k, v in t.items()}

    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
