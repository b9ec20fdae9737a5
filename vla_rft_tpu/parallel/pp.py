"""Pipeline parallelism (GPipe schedule) over the stacked decoder layers.

Replaces the role of verl's Megatron pipeline-parallel worker groups
(train/verl/verl/single_controller/ray/megatron.py and
verl/models/llama/megatron/* pipeline stages) with a TPU-native SPMD
pipeline: the `nn.scan`-stacked layer parameters (leading dim = num_layers)
are sharded over a `pp` mesh axis, and microbatch activations ride a
`lax.ppermute` ring between stages.  One program runs on every stage
(SPMD) — there are no per-stage processes, no send/recv rank plumbing,
and XLA overlaps the ppermute with the next microbatch's compute.

Schedule: classic GPipe fill-drain. With P stages and M microbatches the
loop runs T = M + P - 1 steps; stage p works on microbatch (t - p) at step
t. Bubble fraction = (P-1)/T, so choose M >= 4*P for >80% utilization.

Intended use: full teacher-forced forwards of models too large for one
chip — including TRAINING: jax.grad flows straight through the pipeline
(the transpose of ppermute is the reverse ppermute; gradient parity vs the
sequential model is tested).  Decode loops want inflight-microbatch
pipelining instead (round-2 backlog); at the reference's 0.5B/0.4B scales
PP is not needed for capacity, so this module is the scaling escape hatch,
kept exercised by tests and the multi-chip dryrun.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_spmd(
    stage_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x_mb: jnp.ndarray,
    *,
    axis_name: str,
    num_stages: int,
) -> jnp.ndarray:
    """GPipe loop; call INSIDE shard_map with `axis_name` in scope.

    stage_fn: applies THIS stage's local layers; must preserve shape/dtype.
    x_mb: (M, ...) microbatched stage-0 input (replicated across stages).
    Returns (M, ...) outputs of the LAST stage, replicated to all stages.
    """
    Pn = num_stages
    p = jax.lax.axis_index(axis_name)
    M = x_mb.shape[0]
    T = M + Pn - 1
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]

    def step(recv, t):
        # stage 0 injects microbatch t (clamped; overflow flows never reach
        # the last stage within T steps), later stages consume the ring
        x0 = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
        )
        x = jnp.where(p == 0, x0, recv)
        y = stage_fn(x)
        send = jax.lax.ppermute(y, axis_name, perm)
        return send, y

    _, ys = jax.lax.scan(step, jnp.zeros_like(x_mb[0]), jnp.arange(T))
    # last stage's valid outputs are steps P-1 .. T-1 (microbatches 0..M-1)
    out = jax.lax.dynamic_slice_in_dim(ys, Pn - 1, M, axis=0)
    out = jnp.where(p == Pn - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(out, axis_name)  # replicate the result to all stages


def decoder_pp_forward(
    decoder,
    variables,
    input_ids: jnp.ndarray,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    n_microbatches: Optional[int] = None,
    logits_last_only: bool = False,
):
    """Full causal forward of models/transformer.Decoder, layer-stack
    pipelined over `pp_axis`.  Numerically identical to
    `decoder.apply(variables, input_ids)` (tested).

    Embedding and the final norm + lm_head run replicated (they are tiny
    next to the layer stack); only the `layers` parameter stack — where all
    the memory and FLOPs live — is sharded, PartitionSpec(pp) on the
    leading (num_layers) axis.
    Returns (logits_f32, hidden).
    """
    from vla_rft_tpu.models.transformer import DecoderLayer

    cfg = decoder.cfg
    n_stages = mesh.shape[pp_axis]
    assert cfg.num_layers % n_stages == 0, (cfg.num_layers, n_stages)
    params = variables["params"]
    layer_params = params["layers"]

    emb = decoder.apply(variables, input_ids, embed_only=True)
    B, S, D = emb.shape
    M = n_microbatches or n_stages
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    x_mb = emb.reshape(M, B // M, S, D)

    def run(lp, xm):
        def stage(x):
            b = x.shape[0]
            pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (b, S))
            kvl = jnp.full((b,), S, jnp.int32)

            def body(h, pl):
                h, _ = DecoderLayer(cfg).apply({"params": pl}, h, pos, kvl)
                return h, None

            h, _ = jax.lax.scan(body, x, lp)
            return h

        return pipeline_spmd(stage, xm, axis_name=pp_axis, num_stages=n_stages)

    out = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(pp_axis), P()),
        out_specs=P(),
        check_vma=False,
    )(layer_params, x_mb)
    x = out.reshape(B, S, D)

    # final norm + head, replicated (mirrors Decoder.__call__'s tail)
    w = params["norm"]["weight"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + cfg.rms_norm_eps)
    x = (xf * w).astype(emb.dtype)
    xl = x[:, -1:] if logits_last_only else x
    if cfg.tie_word_embeddings:
        kernel = params["embed_tokens"]["embedding"].astype(cfg.dtype).T
    else:
        kernel = params["lm_head"]["kernel"].astype(cfg.dtype)
    logits = (xl.astype(cfg.dtype) @ kernel).astype(jnp.float32)
    return logits, x
