"""CLI smoke tests: the hydra-style entrypoint runs a tiny training step
end-to-end (subprocess, CPU)."""
import os
import subprocess
import sys


def test_main_vla_rft_grpo_tiny(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['x',"
        "'--preset=tiny',"
        "'trainer.total_training_steps=1',"
        "'data.train_batch_size=2',"
        "'data.video.segment_length=3',"
        "'actor_rollout_ref.rollout.n=2',"
        "'actor_rollout_ref.rollout.num_flow_steps=2',"
        "'actor_rollout_ref.actor.ppo_mini_batch_size=4',"
        "'actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu=2',"
        "'actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu=4',"
        "'processor.tokens_per_frame=4',"
        "'data.max_prompt_length=75',"
        "'data.max_response_length=22',"
        "'world_model_rollout.rollout.interact_max_tokens=4',"
        "'trainer.save_freq=-1','trainer.save_last_freq=-1',"
        f"'trainer.default_local_dir={tmp_path}/ckpt',"
        "'trainer.logger=[\"console\"]',"
        "'mesh={\"dp\": 2, \"fsdp\": 1, \"tp\": 1, \"sp\": 1}',"
        "];"
        "from vla_rft_tpu.trainer.main_vla_rft_grpo import run; run()"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "[step 1]" in result.stdout, result.stdout[-2000:]


def test_main_sft_vla_flow_tiny():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['x','--preset=tiny','sft.mode=vla_flow',"
        "'trainer.total_training_steps=2','data.train_batch_size=2',"
        "'data.video.segment_length=3','processor.tokens_per_frame=4',"
        "'data.max_prompt_length=75','data.max_response_length=22',"
        "'world_model_rollout.rollout.interact_max_tokens=4'];"
        "from vla_rft_tpu.trainer.main_sft import run; run()"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "[sft step 2]" in result.stdout, result.stdout[-2000:]
