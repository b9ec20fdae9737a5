#!/usr/bin/env bash
# Text SFT on parquet (reference: examples/sft/gsm8k/run_qwen_05.sh via
# verl/trainer/fsdp_sft_trainer.py).  Needs MODEL_PATH + TRAIN_FILES
# (parquet with prompt/response columns).
set -x
python3 -m vla_rft_tpu.trainer.main_sft sft.mode=text \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH:?} \
    data.train_files=${TRAIN_FILES:?} \
    data.train_batch_size=${BS:-32} \
    data.max_prompt_length=256 data.max_response_length=512 \
    trainer.total_training_steps=${STEPS:-500} \
    trainer.logger='["console","jsonl"]' "$@"
