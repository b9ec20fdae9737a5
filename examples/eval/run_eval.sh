#!/usr/bin/env bash
# Offline eval of generated responses: pass@1 / best@n per data source
# (reference: verl/trainer/main_eval.py + recipe/r1 tasks).
set -x
python3 -m vla_rft_tpu.trainer.main_eval \
    data.path=${GENERATIONS:?} "$@"
