"""SFT trainers: text CE decreases; flow BC loss decreases
(reference analog: tests/sft/test_sp_loss_match.py role)."""
import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig
from vla_rft_tpu.models.transformer import TransformerConfig
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.sft_trainer import SFTTrainer, VLAFlowSFTTrainer

CFG = TransformerConfig(
    vocab_size=50, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
    attn_impl="xla",
)


def test_text_sft_loss_decreases():
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    t = SFTTrainer(CFG, lr=5e-3, mesh=mesh)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 50, (4, 12))
    batch = {
        "input_ids": ids.astype(np.int32),
        "labels": ids.astype(np.int32),
        "attention_mask": np.ones((4, 12), np.int32),
    }
    losses = [t.training_step(batch) for _ in range(8)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_flow_bc_loss_decreases():
    ecfg = ActionHeadConfig(
        llm_dim=16, dit_hidden=32, dit_depth=2, dit_heads=4,
        num_actions_chunk=4, dtype=jnp.float32,
    )
    expert = ActionExpert(ecfg)
    B = 4
    hidden = jnp.asarray(np.random.default_rng(0).normal(size=(B, 6, 16)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (B, 4, 7)), jnp.float32)
    proprio = jnp.zeros((B, 8))
    params = expert.init(jax.random.key(0), hidden, gt, jnp.zeros((B,)), proprio)
    t = VLAFlowSFTTrainer(expert, params, lr=3e-3)
    losses = [
        t.training_step(jax.random.key(i), hidden, gt, proprio) for i in range(10)
    ]
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_vla_adapter_sft_trains_vlm():
    """VLAAdapterSFTTrainer (finetune.py parity): gradient flows into the
    VLM; frozen subtrees stay bit-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.models.factory import build_models, fast_random_params
    from vla_rft_tpu.trainer.sft_trainer import VLAAdapterSFTTrainer

    c = vla_rft_default_config()
    c.data.video.segment_length = 3
    bundle = build_models(c, preset="tiny")
    params = fast_random_params(bundle, 0)
    tr = VLAAdapterSFTTrainer(
        bundle.vla, bundle.expert, params["vla"], params["expert"],
        freeze_vision_backbone=True,
    )
    frozen_before = jax.tree_util.tree_map(
        np.asarray, tr.params["vla"]["params"]["vision_backbone"]
    )
    lm_before = jax.tree_util.tree_map(
        np.asarray, tr.params["vla"]["params"]["language_model"]
    )

    rng = np.random.default_rng(0)
    B, S = 2, bundle.policy_seq_len
    img = bundle.policy_image_size
    batch = {
        "input_ids": rng.integers(1, 100, (B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int32),
        "pixels": rng.random((B, img, img, 6)).astype(np.float32),
        "proprio": rng.random((B, 8)).astype(np.float32),
        "actions": rng.random(
            (B, bundle.expert_cfg.num_actions_chunk, bundle.expert_cfg.action_dim)
        ).astype(np.float32),
    }
    # mark some action-query positions so encode_context has query slots
    batch["labels"][:, -bundle.vla_cfg.num_tokens :] = 1
    loss0 = tr.training_step(jax.random.key(0), batch)
    loss1 = tr.training_step(jax.random.key(1), batch)
    assert np.isfinite(loss0) and np.isfinite(loss1)

    frozen_after = tr.params["vla"]["params"]["vision_backbone"]
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(frozen_before),
        jax.tree_util.tree_leaves_with_path(frozen_after),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the unfrozen LLM moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(lm_before),
            jax.tree_util.tree_leaves(tr.params["vla"]["params"]["language_model"]),
        )
    )
    assert moved


def test_prismatic_align_trains_projector_only():
    """PrismaticAlignTrainer (legacy prismatic pretraining stage 'align'):
    caption LM loss decreases; ONLY the projector updates — towers and the
    LLM stay bit-identical (reference prismatic training strategies)."""
    import jax
    import numpy as np

    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.models.factory import build_models, fast_random_params
    from vla_rft_tpu.trainer.sft_trainer import PrismaticAlignTrainer

    c = vla_rft_default_config()
    c.data.video.segment_length = 3
    bundle = build_models(c, preset="tiny")
    params = fast_random_params(bundle, 0)
    tr = PrismaticAlignTrainer(bundle.vla, params["vla"], lr=3e-3)

    before = {
        k: jax.tree_util.tree_map(np.asarray, tr.params["params"][k])
        for k in ("vision_backbone", "language_model", "action_queries")
    }
    proj_before = jax.tree_util.tree_map(
        np.asarray, tr.params["params"]["projector"]
    )

    rng = np.random.default_rng(0)
    B, S = 2, bundle.policy_seq_len
    img = bundle.policy_image_size
    ids = rng.integers(1, 100, (B, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, : S // 4] = -100
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones((B, S), np.int32),
        "labels": labels,
        "pixel_values": rng.random((B, img, img, 6)).astype(np.float32),
    }
    losses = [tr.training_step(batch) for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    for k, b4 in before.items():
        for (p, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(b4),
            jax.tree_util.tree_leaves_with_path(tr.params["params"][k]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb), err_msg=str(p))
    # and the projector DID move
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()),
        proj_before, tr.params["params"]["projector"],
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0
