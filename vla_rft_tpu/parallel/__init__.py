from vla_rft_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    named_sharding,
    replicated,
    shard_batch,
    shard_params_fsdp,
    batch_sharding,
)
