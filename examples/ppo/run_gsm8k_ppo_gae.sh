#!/usr/bin/env bash
# Classic PPO with a learned critic / GAE (reference:
# examples/ppo_trainer/run_qwen2-7b_rm.sh shape).
set -x
python3 -m vla_rft_tpu.trainer.main_ppo \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH:?} \
    data.train_files=${TRAIN_FILES:?} \
    data.train_batch_size=${BS:-32} \
    algorithm.adv_estimator=gae \
    critic.optim.lr=1e-5 \
    trainer.total_training_steps=${STEPS:-200} \
    trainer.logger='["console","jsonl"]' "$@"
