#!/usr/bin/env bash
# Batch generation to parquet (reference: verl/trainer/main_generation.py).
set -x
python3 -m vla_rft_tpu.trainer.main_generation \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH:?} \
    data.train_files=${PROMPTS:?} \
    data.output_path=${OUT:-generations.parquet} \
    actor_rollout_ref.rollout.n=${N:-1} \
    actor_rollout_ref.rollout.temperature=${TEMP:-1.0} "$@"
