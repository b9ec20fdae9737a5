"""Example: text-RL PPO on a toy digit task with a rule reward.

Run: python examples/run_ppo_toy.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.config import vla_rft_default_config
from vla_rft_tpu.models.transformer import TransformerConfig
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.ppo_trainer import PPOTrainer
from vla_rft_tpu.workers.reward_manager import NaiveRewardManager

VOCAB = 32
LLM = TransformerConfig(
    vocab_size=VOCAB, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
    attn_impl="xla",
)


class Tok:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)

    def encode(self, text):
        return [int(t) % VOCAB for t in text.split() if t.isdigit()] or [3]


class Data:
    def __init__(self):
        self.rng = np.random.default_rng(0)

    def sample_batch(self, b):
        ids = np.zeros((b, 12), np.int32)
        for i in range(b):
            n = int(self.rng.integers(3, 12))
            ids[i, 12 - n:] = self.rng.integers(3, VOCAB, n)
        return {"input_ids": ids, "data_sources": ["toy"] * b, "ground_truths": ["7"] * b}


c = vla_rft_default_config().apply_overrides([
    "data.train_batch_size=2", "actor_rollout_ref.rollout.n=2",
    "actor_rollout_ref.rollout.response_length=6",
    "actor_rollout_ref.actor.ppo_mini_batch_size=4",
    "actor_rollout_ref.actor.optim.lr=1e-3",
    "algorithm.adv_estimator=grpo",
    "processor.eos_token_id=2", "processor.pad_token_id=0",
    "trainer.total_training_steps=3",
])
trainer = PPOTrainer(
    c, LLM, Tok(), Data(), mesh=make_mesh(MeshConfig(dp=2)),
    reward_manager=NaiveRewardManager(Tok(), compute_score=lambda s, t, g, e=None: float(g in t.split())),
)
trainer.fit()
