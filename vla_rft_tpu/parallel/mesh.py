"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed plumbing:

* torch.distributed/NCCL process groups + FSDP device meshes
  (reference: train/verl/verl/workers/fsdp_workers.py:56-88) become one
  `jax.sharding.Mesh` with axes ``(dp, fsdp, tp, sp)``; XLA inserts the
  collectives.
* Ray's env-var rendezvous "register center"
  (verl/single_controller/base/worker.py:101-116) is `jax.distributed.initialize`
  on multi-host — no first-party code needed.
* verl's `Dispatch.DP_COMPUTE_PROTO` chunk/concat over workers
  (verl/single_controller/base/decorator.py:272-297) becomes data sharded over
  the ``dp`` axis of the same jit'd program.

Axis conventions (mirrors the scaling-book recipe):
  dp    data parallel — batch dim of every stage
  fsdp  parameter/optimizer sharding (ZeRO-3 analog); batch also sharded here
  tp    tensor parallel — attention heads / mlp hidden
  sp    sequence parallel (Ulysses analog, all-to-all over this axis)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: use all remaining devices
    fsdp: int = 1
    tp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        fixed = self.fsdp * self.tp * self.sp
        dp = self.dp
        if dp == -1:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by fsdp*tp*sp={fixed}")
            dp = n_devices // fixed
        if dp * fixed != n_devices:
            raise ValueError(
                f"mesh {dp}x{self.fsdp}x{self.tp}x{self.sp} != {n_devices} devices"
            )
        return MeshConfig(dp=dp, fsdp=self.fsdp, tp=self.tp, sp=self.sp)


AXES = ("dp", "fsdp", "tp", "sp")


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.tp, cfg.sp)
    return Mesh(arr, AXES)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over dp and fsdp jointly (pure-DP compute, ZeRO params)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every [B, ...] leaf with batch dim sharded over (dp, fsdp)."""
    sh = batch_sharding(mesh)

    def _put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, tree)


def _fsdp_spec_for(shape: tuple, fsdp_size: int, min_size: int = 2**16) -> P:
    """ZeRO-3-style parameter spec: shard the largest divisible dim over 'fsdp'.

    Small params (< min_size elements) stay replicated — the reference keeps
    small heads in DDP (fsdp_workers.py:336-359), i.e. replicated, too.
    """
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest dim divisible by fsdp_size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params_fsdp(mesh: Mesh, params: Any, min_size: int = 2**16) -> Any:
    """Device_put a parameter pytree with fsdp sharding (replicated over dp/tp/sp)."""
    fsdp_size = mesh.shape["fsdp"]

    def _put(x):
        spec = _fsdp_spec_for(np.shape(x), fsdp_size, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, params)


def param_shardings(mesh: Mesh, params: Any, min_size: int = 2**16) -> Any:
    """Sharding pytree (for jit in_shardings/out_shardings) matching shard_params_fsdp."""
    fsdp_size = mesh.shape["fsdp"]

    def _sh(x):
        return NamedSharding(mesh, _fsdp_spec_for(np.shape(x), fsdp_size, min_size))

    return jax.tree_util.tree_map(_sh, params)
