"""Tensor-parallel sharding: TP-sharded forward == replicated forward
(reference analog: tests/e2e/run_deepseek_megatron_parallelism.sh role)."""
import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.parallel.tp import shard_decoder_params_tp

CFG = TransformerConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
    attn_impl="xla",
)


def test_tp_forward_matches_replicated():
    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    model = Decoder(CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    params = model.init(jax.random.key(0), ids)
    ref_logits, _, _ = model.apply(params, ids)

    tp_params = shard_decoder_params_tp(mesh, params)
    # some param actually got a tp-sharded placement
    specs = {
        tuple(str(getattr(p, "key", p)) for p in path): leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_flatten_with_path(tp_params)[0]
    }
    assert any("tp" in str(s) for s in specs.values()), specs
    with mesh:
        logits, _, _ = jax.jit(lambda p, i: model.apply(p, i))(tp_params, ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), atol=2e-5, rtol=1e-4)
