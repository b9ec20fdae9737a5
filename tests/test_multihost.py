"""Multi-host (process_count > 1) smoke test over jax.distributed.

The reference rendezvous is a Ray "register center" actor publishing rank-0's
MASTER_ADDR/PORT into every worker's env (verl/single_controller/base/
worker.py:101-116) followed by torch.distributed.init_process_group per
worker (fsdp_workers.py:87-88).  The TPU-native replacement is
`jax.distributed.initialize` + one global `jax.sharding.Mesh`; each process
feeds its `local_batch_slice` of the global batch.  This test runs the real
thing: TWO OS processes (CPU backend, 2 virtual devices each, Gloo
cross-process collectives) build a 4-device global dp mesh through
`vla_rft_tpu.parallel` helpers, shard a global batch from process-local
shards, and run a jitted global-mean reduction — exercising rendezvous,
process-sharded feeding, and a DCN-analog collective end to end.
"""
import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from vla_rft_tpu.parallel.distributed import initialize_distributed, local_batch_slice

# the env-var path is what a pod launcher would set
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from vla_rft_tpu.parallel.mesh import MeshConfig, batch_sharding, make_mesh, replicated

mesh = make_mesh(MeshConfig(dp=-1))  # global mesh: 4 devices over 2 processes
assert mesh.devices.size == 2 * nproc

GB = 8  # global batch
sl = local_batch_slice(GB)
full = np.arange(GB * 3, dtype=np.float32).reshape(GB, 3)
local = full[sl]
assert local.shape[0] == GB // nproc

arr = jax.make_array_from_process_local_data(batch_sharding(mesh), local, (GB, 3))
out = jax.jit(
    lambda x: jnp.mean(x), out_shardings=replicated(mesh)
)(arr)
got = float(jax.device_get(out))
want = float(full.mean())
assert abs(got - want) < 1e-6, (got, want)
print(f"OK proc={pid} mean={got}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"OK proc={pid}" in out, out


def test_local_batch_slice_single_process():
    from vla_rft_tpu.parallel.distributed import local_batch_slice

    assert local_batch_slice(16) == slice(0, 16)
