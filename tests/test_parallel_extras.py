"""Ulysses SP parity (reference: tests/model/test_transformers_ulysses.py),
seqlen balancing, flops counter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_rft_tpu.ops.attention import attention
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.parallel.ulysses import ulysses_attention, ulysses_pad_and_slice
from vla_rft_tpu.utils.flops_counter import FlopsCounter
from vla_rft_tpu.utils.seqlen_balancing import (
    get_reverse_idx,
    get_seqlen_balanced_partitions,
    rearrange_micro_batches,
)


def test_ulysses_matches_single_device_attention():
    """SP over 4 shards reproduces full attention logits (the reference's
    ulysses-vs-single-GPU parity check)."""
    mesh = make_mesh(MeshConfig(dp=2, sp=4))
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 32, 8, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    ref = attention(q, k, v, causal=True, impl="xla")
    out = ulysses_attention(q, k, v, mesh, axis_name="sp", causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ulysses_gqa_head_repeat():
    mesh = make_mesh(MeshConfig(dp=2, sp=4))
    rng = np.random.default_rng(1)
    B, S, H, HKV, D = 2, 16, 8, 2, 8  # kv heads 2 < sp 4 -> repeat
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.float32)
    ref = attention(q, k, v, causal=True, impl="xla")
    out = ulysses_attention(q, k, v, mesh, axis_name="sp", causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ulysses_pad():
    x = jnp.ones((2, 10, 4, 8))
    padded, pad = ulysses_pad_and_slice(x, 4)
    assert padded.shape[1] == 12 and pad == 2


def test_seqlen_partitions_balanced():
    rng = np.random.default_rng(0)
    lens = rng.integers(10, 1000, 32).tolist()
    parts = get_seqlen_balanced_partitions(lens, 4, equal_size=True)
    assert sorted(i for p in parts for i in p) == list(range(32))
    assert all(len(p) == 8 for p in parts)
    sums = [sum(lens[i] for i in p) for p in parts]
    assert max(sums) - min(sums) < sum(lens) / 4 * 0.5


def test_rearrange_micro_batches():
    lens = [100, 200, 300, 400, 250, 150]
    parts = rearrange_micro_batches(lens, max_token_len=500)
    assert sorted(i for p in parts for i in p) == list(range(6))
    assert all(sum(lens[i] for i in p) <= 500 for p in parts)
    idx = [i for p in parts for i in p]
    rev = get_reverse_idx(idx)
    assert [idx[rev[i]] for i in range(6)] == list(range(6))


def test_flops_counter():
    from vla_rft_tpu.models.transformer import TransformerConfig

    cfg = TransformerConfig.wm_llama(vocab_size=9008)
    fc = FlopsCounter(cfg, "TPU v5 lite")
    achieved, promised = fc.estimate_flops([1663] * 32, delta_time=1.0)
    assert promised == 197e12
    # ~0.4B params -> ~0.86 GFLOP/token forward+... sanity range
    per_tok = fc.flops_per_token(1663)
    assert 5e8 < per_tok < 5e9


def test_decoder_ulysses_sp_matches_plain():
    """Full-decoder SP parity (reference: tests/model/test_transformers_ulysses.py):
    sequence-sharded forward under shard_map == replicated forward."""
    import dataclasses
    from jax.sharding import PartitionSpec as P
    from vla_rft_tpu.models.transformer import Decoder, TransformerConfig

    mesh = make_mesh(MeshConfig(dp=2, sp=4))
    base = TransformerConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=8, num_kv_heads=8, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    model = Decoder(base)
    B, S = 2, 16
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (B, S)))
    params = model.init(jax.random.key(0), ids)
    ref_logits, _, _ = model.apply(params, ids)

    sp_cfg = dataclasses.replace(base, ulysses_axis="sp")
    sp_model = Decoder(sp_cfg)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    kv_lens = jnp.full((B,), S, jnp.int32)

    def fwd(params, ids, positions, kv_lens):
        logits, _, _ = sp_model.apply(
            params, ids, positions=positions, kv_lens=kv_lens
        )
        return logits

    sharded = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(None, "sp"), P(None, "sp"), P()),
        out_specs=P(None, "sp"),
        check_vma=False,
    )
    logits = sharded(params, ids, positions, kv_lens)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=3e-5, rtol=1e-4
    )


def test_step_flops_families():
    """The extended FLOPs bodies are the right order of magnitude (sanity
    against hand calcs: VGG16@224 is the textbook ~15.5 GFLOPs × 2)."""
    from vla_rft_tpu.models.transformer import TransformerConfig
    from vla_rft_tpu.utils.flops_counter import (
        conv_decoder_flops_per_frame,
        dit_flops,
        vgg16_flops_per_image,
        vit_flops_per_image,
        vla_rft_step_flops,
    )

    vgg = vgg16_flops_per_image(224)
    assert 25e9 < vgg < 36e9, vgg  # 2 * ~15.5 GFLOPs of MACs

    vit = vit_flops_per_image(224, 14, 1152, 27)
    assert 0.15e12 < vit < 0.4e12, vit  # so400m ~0.21 TFLOPs fwd (256 tok)

    detok = conv_decoder_flops_per_frame()
    assert 2e11 < detok < 2e12, detok

    d = dit_flops(8, 56, 7 * 896)
    assert 1e8 < d < 1e10, d

    total = vla_rft_step_flops(
        num_sequences=64, num_uniques=4, wm_cfg=TransformerConfig.wm_llama(),
        prompt_len=1095, response_len=568, num_frames=8,
    )
    # the RFT step is dominated by WM decode + detokenize + LPIPS; tens of
    # TFLOPs per 64-seq step on one chip
    assert 2e13 < total < 2e15, total


def test_throughput_metrics_mfu():
    from vla_rft_tpu.trainer.metric_utils import compute_throughput_metrics

    out = compute_throughput_metrics(
        {"step": 10.0, "wm_rollout": 5.0}, 64, 8, 1,
        step_flops=985e12, peak_flops=197e12,
    )
    assert abs(out["perf/mfu"] - 0.5) < 1e-6
    out2 = compute_throughput_metrics({"step": 10.0}, 64, 8, 1)
    assert "perf/mfu" not in out2
