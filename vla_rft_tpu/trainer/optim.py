"""Optimizer: two-group AdamW with warmup on the base group only, per-module
gradient clipping, and a non-finite skip guard.

Mirrors the reference actor optimizer exactly
(verl/workers/fsdp_workers.py:414-471): group 0 = action head + projectors at
`lr` with linear warmup, group 1 = sigma net at `sigma_lr` with no warmup and
its own weight decay; and `_optimizer_step`'s per-module clip_grad_norm with
NaN detection that *skips the step* (verl/workers/actor/dp_actor.py:197-277)
— here a `lax.cond` keeps params+opt state unchanged when any group's grad is
non-finite, instead of python-side prints.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

SIGMA_KEY = "sigma_net"


def _group_of(path: Tuple) -> str:
    """Top-level module name under params/ for grouping."""
    for p in path:
        key = getattr(p, "key", None)
        if key is not None and key != "params":
            return key
    return "base"


def label_params(params) -> Any:
    """'sigma' for sigma_net params, 'base' for everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "sigma" if _group_of(path) == SIGMA_KEY else "base", params
    )


def make_optimizer(optim_cfg, total_training_steps: int) -> optax.GradientTransformation:
    base_lr = optim_cfg.get("lr", 1e-6)
    wd = optim_cfg.get("weight_decay", 0.01)
    betas = optim_cfg.get("betas", [0.9, 0.999])
    sigma_lr = optim_cfg.get("sigma_lr", base_lr * 2.0)
    sigma_wd = optim_cfg.get("sigma_weight_decay", 0.0)
    warmup = optim_cfg.get("lr_warmup_steps", -1)
    if warmup is None or warmup < 0:
        warmup = int(optim_cfg.get("lr_warmup_steps_ratio", 0.0) * total_training_steps)

    if warmup > 0:
        base_sched = optax.linear_schedule(0.0, base_lr, warmup)
        base_schedule = lambda step: jnp.where(
            step < warmup, base_sched(step), base_lr
        )
    else:
        base_schedule = base_lr

    base_tx = optax.adamw(base_schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    sigma_tx = optax.adamw(sigma_lr, b1=betas[0], b2=betas[1], weight_decay=sigma_wd)
    return optax.multi_transform({"base": base_tx, "sigma": sigma_tx}, label_params)


def clip_grads_per_module(grads, max_norm: float):
    """Per-top-level-module global-norm clip (dp_actor._optimizer_step):
    each module group clipped to max_norm independently; returns
    (clipped_grads, global_norm, all_finite)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    groups: Dict[str, list] = {}
    for path, leaf in flat:
        groups.setdefault(_group_of(path), []).append(leaf)

    norms = {
        g: jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
        for g, leaves in groups.items()
    }
    finite = jnp.all(jnp.asarray([jnp.isfinite(n) for n in norms.values()]))
    scales = {
        g: jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12)) for g, n in norms.items()
    }

    def scale_leaf(path, leaf):
        return leaf * scales[_group_of(path)].astype(leaf.dtype)

    clipped = jax.tree_util.tree_map_with_path(scale_leaf, grads)
    # composed global norm of disjoint groups (dp_actor.py:257-268)
    global_norm = jnp.sqrt(sum(jnp.minimum(n, max_norm) ** 2 for n in norms.values()))
    return clipped, global_norm, finite


def apply_updates_with_skip(
    tx: optax.GradientTransformation,
    params,
    opt_state,
    grads,
    max_norm: float,
):
    """Clip per module; if any grad is non-finite, skip the step entirely
    (params and optimizer state unchanged) and report grad_norm = NaN."""
    clipped, global_norm, finite = clip_grads_per_module(grads, max_norm)

    def do_update(_):
        updates, new_state = tx.update(clipped, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    def skip(_):
        return params, opt_state

    new_params, new_state = jax.lax.cond(finite, do_update, skip, None)
    reported = jnp.where(finite, global_norm, jnp.nan)
    return new_params, new_state, reported
