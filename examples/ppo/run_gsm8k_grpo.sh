#!/usr/bin/env bash
# GRPO on gsm8k (reference: examples/grpo_trainer/run_qwen2-7b.sh shape).
# Needs: MODEL_PATH (HF Qwen2.5 dir with safetensors+tokenizer),
#        TRAIN_FILES (gsm8k parquet with prompt + reward_model.ground_truth).
set -x
python3 -m vla_rft_tpu.trainer.main_ppo \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH:?} \
    data.train_files=${TRAIN_FILES:?} \
    data.train_batch_size=${BS:-32} \
    data.max_prompt_length=256 data.max_response_length=256 \
    algorithm.adv_estimator=grpo \
    actor_rollout_ref.rollout.n=8 \
    actor_rollout_ref.actor.use_kl_loss=True \
    actor_rollout_ref.actor.kl_loss_coef=0.001 \
    trainer.total_training_steps=${STEPS:-200} \
    trainer.logger='["console","jsonl"]' "$@"
