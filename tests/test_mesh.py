import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    shard_batch,
    shard_params_fsdp,
    _fsdp_spec_for,
)
from jax.sharding import PartitionSpec as P


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=-1, fsdp=2))
    assert mesh.shape["fsdp"] == 2
    assert mesh.shape["dp"] * 2 == len(jax.devices())


def test_mesh_invalid():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(dp=3, fsdp=3))


def test_fsdp_spec_prefers_large_divisible_dim():
    assert _fsdp_spec_for((1024, 896), 4, min_size=0) == P("fsdp", None)
    assert _fsdp_spec_for((7, 896), 4, min_size=0) == P(None, "fsdp")
    assert _fsdp_spec_for((7, 7), 4, min_size=0) == P()
    # tiny params stay replicated
    assert _fsdp_spec_for((64, 64), 4, min_size=2**16) == P()


def test_shard_batch_and_params_execute():
    mesh = make_mesh(MeshConfig(dp=4, fsdp=2))
    x = {"a": jnp.ones((8, 16)), "b": jnp.zeros((8,))}
    xs = shard_batch(mesh, x)
    assert xs["a"].sharding.spec == P(("dp", "fsdp"))
    params = {"w": jnp.ones((256, 1024)), "b": jnp.ones((3,))}
    ps = shard_params_fsdp(mesh, params, min_size=1024)
    assert ps["w"].sharding.spec in (P("fsdp", None), P(None, "fsdp"))
    # a jitted op over sharded data runs
    y = jax.jit(lambda t: t["a"].sum())(xs)
    np.testing.assert_allclose(float(y), 8 * 16)
