"""Pipeline parallelism: GPipe pipeline == sequential layer stack.

Covers the role of the reference's Megatron pipeline-parallel model tests
(train/verl/tests/model/test_transformers_ulysses.py-style parity checks,
applied to the pp axis instead of sp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.parallel.pp import decoder_pp_forward, pipeline_spmd
from jax.sharding import Mesh, PartitionSpec as P


def _mesh(n, name="pp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def test_pipeline_spmd_matches_sequential():
    n_stages, M, b, d = 4, 8, 2, 16
    mesh = _mesh(n_stages)
    # "layers": each stage applies y = x * w_local + 1 for its local weights
    ws = jnp.linspace(0.5, 1.5, n_stages * 2).reshape(n_stages * 2, 1)
    x_mb = jax.random.normal(jax.random.key(0), (M, b, d), jnp.float32)

    def run(lw, xm):
        def stage(x):
            def body(h, w):
                return h * w + 1.0, None

            h, _ = jax.lax.scan(body, x, lw)
            return h

        return pipeline_spmd(stage, xm, axis_name="pp", num_stages=n_stages)

    out = jax.shard_map(
        run, mesh=mesh, in_specs=(P("pp"), P()), out_specs=P(), check_vma=False
    )(ws, x_mb)

    ref = x_mb
    for w in np.asarray(ws)[:, 0]:
        ref = ref * w + 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("n_microbatches", [4, 8])
def test_decoder_pp_forward_parity(n_microbatches):
    cfg = TransformerConfig(
        vocab_size=97,
        hidden_size=64,
        intermediate_size=128,
        num_layers=8,
        num_heads=4,
        num_kv_heads=2,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    dec = Decoder(cfg)
    B, S = 8, 16
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    variables = dec.init(jax.random.key(2), ids)

    ref_logits, ref_hidden, _ = dec.apply(variables, ids)
    mesh = _mesh(4)
    logits, hidden = decoder_pp_forward(
        dec, variables, ids, mesh, n_microbatches=n_microbatches
    )
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), atol=1e-4)


def test_decoder_pp_tied_embeddings_and_last_only():
    cfg = TransformerConfig(
        vocab_size=53,
        hidden_size=32,
        intermediate_size=64,
        num_layers=4,
        num_heads=2,
        num_kv_heads=2,
        tie_word_embeddings=True,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    dec = Decoder(cfg)
    B, S = 4, 8
    ids = jax.random.randint(jax.random.key(3), (B, S), 0, cfg.vocab_size)
    variables = dec.init(jax.random.key(4), ids)
    ref_logits, _, _ = dec.apply(variables, ids, logits_last_only=True)
    mesh = _mesh(2)
    logits, _ = decoder_pp_forward(
        dec, variables, ids, mesh, n_microbatches=4, logits_last_only=True
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), atol=1e-4)


def test_decoder_pp_gradients_match_sequential():
    """Training THROUGH the pipeline: grads w.r.t. the layer stack computed
    under shard_map+ppermute must equal the sequential model's grads."""
    cfg = TransformerConfig(
        vocab_size=41,
        hidden_size=32,
        intermediate_size=64,
        num_layers=4,
        num_heads=2,
        num_kv_heads=2,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    dec = Decoder(cfg)
    B, S = 4, 8
    ids = jax.random.randint(jax.random.key(5), (B, S), 0, cfg.vocab_size)
    variables = dec.init(jax.random.key(6), ids)
    mesh = _mesh(2)

    def loss_pp(v):
        logits, _ = decoder_pp_forward(dec, v, ids, mesh, n_microbatches=4)
        return jnp.mean(logits**2)

    def loss_seq(v):
        logits, _, _ = dec.apply(v, ids)
        return jnp.mean(logits**2)

    g_pp = jax.grad(loss_pp)(variables)["params"]
    g_seq = jax.grad(loss_seq)(variables)["params"]
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_seq = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_seq)}
    for k, v in flat_pp:
        ref = flat_seq[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(k),
        )
