"""CLI entrypoint for the generic text-RL PPO loop.

Counterpart of train/verl/verl/trainer/main_ppo.py: loads a parquet RLHF
dataset, an HF tokenizer + converted policy weights, and runs
PPOTrainer.fit() with the configured advantage estimator and reward manager.
"""
from __future__ import annotations

import sys


def run(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from vla_rft_tpu.config import vla_rft_default_config

    config = vla_rft_default_config().apply_overrides([a for a in argv if "=" in a])

    from transformers import AutoTokenizer

    from vla_rft_tpu.data.rlhf_dataset import RLHFDataset
    from vla_rft_tpu.models.transformer import TransformerConfig
    from vla_rft_tpu.trainer.ppo_trainer import PPOTrainer
    from vla_rft_tpu.workers.reward_manager import NaiveRewardManager

    model_path = config.actor_rollout_ref.model.ckpt_path
    if not model_path:
        raise SystemExit("actor_rollout_ref.model.ckpt_path is required")
    tokenizer = AutoTokenizer.from_pretrained(model_path)

    llm_cfg = TransformerConfig.qwen25_0_5b()  # override via config as needed
    dataset = RLHFDataset(
        config.data.get("train_files"),
        tokenizer,
        prompt_key=config.data.get("prompt_key", "prompt"),
        max_prompt_length=config.data.get("max_prompt_length", 256),
        pad_token_id=tokenizer.pad_token_id or 0,
    )
    trainer = PPOTrainer(
        config, llm_cfg, tokenizer, dataset,
        reward_manager=NaiveRewardManager(tokenizer),
    )
    # load converted weights when available
    import glob
    import os

    import jax
    import safetensors.numpy as stn

    from tools.convert_weights import convert_hf_decoder

    sd = {}
    for f in glob.glob(os.path.join(model_path, "*.safetensors")):
        sd.update(stn.load_file(f))
    if sd:
        trainer.actor_params = jax.device_put(convert_hf_decoder(sd, llm_cfg))
        trainer.ref_params = trainer.actor_params
        trainer.actor_opt_state = trainer.actor_tx.init(trainer.actor_params)
    trainer.fit()


if __name__ == "__main__":
    run()
