"""Tensor-parallel sharding rules for the Decoder.

Replaces the reference's Megatron tensor-parallel reimplementations
(verl/models/llama/megatron/modeling_llama_megatron.py,
layers/parallel_attention.py ColumnParallel/RowParallel): on TPU, TP is a
PartitionSpec on the SAME flax module — q/k/v projections column-parallel
(heads sharded over 'tp'), o_proj row-parallel (heads in-dim sharded), MLP
gate/up column-parallel and down row-parallel, embeddings/lm_head sharded on
the vocab dim.  XLA inserts the all-reduces Megatron does by hand.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _decoder_tp_spec(path_names, shape, tp: int) -> P:
    """PartitionSpec for one decoder param. path_names: tuple of str keys.
    Layer-stacked params have a leading L axis (nn.scan layout)."""
    name = "/".join(path_names)
    nd = len(shape)

    def ok(dim_from_end, size_axis):
        return shape[nd - dim_from_end] % tp == 0

    if "q_proj/kernel" in name or "k_proj/kernel" in name or "v_proj/kernel" in name:
        # (..., in, heads, hd): shard heads
        if shape[-2] % tp == 0:
            return P(*([None] * (nd - 2) + ["tp", None]))
    elif "q_proj/bias" in name or "k_proj/bias" in name or "v_proj/bias" in name:
        if shape[-2] % tp == 0:
            return P(*([None] * (nd - 2) + ["tp", None]))
    elif "o_proj/kernel" in name:
        # (..., heads, hd, out): shard heads (row-parallel in-dim)
        if shape[-3] % tp == 0:
            return P(*([None] * (nd - 3) + ["tp", None, None]))
    elif "gate_proj/kernel" in name or "up_proj/kernel" in name:
        # (..., in, inter): shard inter
        if shape[-1] % tp == 0:
            return P(*([None] * (nd - 1) + ["tp"]))
    elif "down_proj/kernel" in name:
        # (..., inter, out): shard inter (row-parallel)
        if shape[-2] % tp == 0:
            return P(*([None] * (nd - 2) + ["tp", None]))
    elif "embed_tokens/embedding" in name or "lm_head/kernel" in name:
        # vocab dim sharded
        vocab_axis = 0 if "embedding" in name else nd - 1
        if shape[vocab_axis] % tp == 0:
            spec = [None] * nd
            spec[vocab_axis] = "tp"
            return P(*spec)
    return P()


def shard_decoder_params_tp(mesh: Mesh, params: Any) -> Any:
    """device_put decoder params with TP sharding over the 'tp' mesh axis
    (replicated over other axes; combine with fsdp via spec union upstream)."""
    tp = mesh.shape["tp"]

    def _put(path, x):
        names = tuple(str(getattr(p, "key", p)) for p in path)
        spec = _decoder_tp_spec(names, np.shape(x), tp) if tp > 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_put, params)
