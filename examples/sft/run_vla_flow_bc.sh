#!/usr/bin/env bash
# VLA flow-matching behavior cloning (the VLA-Adapter SFT stage:
# vla-adapter/openvla-oft/vla-scripts/finetune.py) on RLDS LIBERO data.
set -x
python3 -m vla_rft_tpu.trainer.main_sft sft.mode=vla_flow \
    data.video.dataset_path=${RLDS_PATH:?} \
    data.video.dataset_name=${DATASET:-libero_spatial_no_noops} \
    actor_rollout_ref.model.ckpt_path=${MODEL_PATH} \
    data.train_batch_size=${BS:-16} \
    trainer.total_training_steps=${STEPS:-10000} \
    trainer.logger='["console","jsonl"]' "$@"
