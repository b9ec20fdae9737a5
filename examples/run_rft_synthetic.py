"""Example: 3 RFT steps on synthetic LIBERO-shaped data, tiny models, CPU.

(examples/ parity with train/verl/examples: runnable per-algorithm demos.)
Run: python examples/run_rft_synthetic.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax

jax.config.update("jax_platforms", "cpu")

from vla_rft_tpu.config import vla_rft_default_config
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer

c = vla_rft_default_config().apply_overrides([
    "trainer.total_training_steps=3",
    "data.train_batch_size=2",
    "data.video.segment_length=3",
    "actor_rollout_ref.rollout.n=2",
    "actor_rollout_ref.rollout.num_flow_steps=2",
    "actor_rollout_ref.actor.ppo_mini_batch_size=4",
    "actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu=2",
    "actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu=4",
    "processor.tokens_per_frame=4",
    "data.max_prompt_length=75",
    "data.max_response_length=22",
    "world_model_rollout.rollout.interact_max_tokens=4",
    "trainer.save_freq=-1", "trainer.save_last_freq=-1",
])
trainer = VLARFTGRPOTrainer(c, preset="tiny", mesh=make_mesh(MeshConfig(dp=2)))
trainer.fit()
