#!/usr/bin/env bash
# remax on gsm8k (reference: examples/remax_trainer/). Same data/model
# env vars as run_gsm8k_grpo.sh.
# ReMax needs a greedy baseline rollout (PPOTrainer does this automatically)
set -x
python3 -m vla_rft_tpu.trainer.main_ppo \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH:?} \
    data.train_files=${TRAIN_FILES:?} \
    data.train_batch_size=${BS:-32} \
    data.max_prompt_length=256 data.max_response_length=256 \
    algorithm.adv_estimator=remax \
    actor_rollout_ref.rollout.n=4 \
    trainer.total_training_steps=${STEPS:-200} \
    trainer.logger='["console","jsonl"]' "$@"
