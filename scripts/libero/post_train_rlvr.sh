#!/usr/bin/env bash
# RFT launch (reference: scripts/libero/post_train_rlvr.sh -> run_vla_rft.sh)
set -x
export LIBERO_TASK_NAME=${LIBERO_TASK_NAME:-spatial}
export DATE=$(date +%Y%m%d)
export POST_EXP_NAME=${POST_EXP_NAME:-vla_rft_fm_tpu}
bash "$(dirname "$0")/run_vla_rft.sh"
