#!/usr/bin/env bash
# TPU-native equivalent of scripts/libero/eval_libero.sh
set -x
python3 -m vla_rft_tpu.eval.main_eval \
    --task_suite_name ${TASK_SUITE:-libero_spatial} \
    --num_trials_per_task ${TRIALS:-50} \
    --ckpt ${VLA_CKPT:-} "$@"
