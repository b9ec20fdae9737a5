#!/usr/bin/env bash
# VLA-Adapter fine-tuning with a TRAINABLE VLM backbone
# (vla-scripts/finetune.py parity; freeze flags mirror its switches).
set -x
python3 -m vla_rft_tpu.trainer.main_sft sft.mode=vla_adapter \
    sft.freeze_vision_backbone=${FREEZE_VISION:-false} \
    sft.freeze_llm=${FREEZE_LLM:-false} \
    data.video.dataset_path=${RLDS_PATH} \
    data.train_batch_size=${BS:-16} \
    trainer.total_training_steps=${STEPS:-10000} "$@"
