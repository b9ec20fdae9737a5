#!/usr/bin/env bash
# R1-style eval recipe (reference: train/verl/recipe/r1): generate N samples
# per prompt with main_generation, then offline-score with the rule
# verifiers (gsm8k/math/math_dapo/gpqa) and report pass@1 / best@n.
set -e
OUT=${OUT:-/tmp/r1_generations.parquet}
python3 -m vla_rft_tpu.trainer.main_generation \
    data.output_path="$OUT" "$@"
python3 -m vla_rft_tpu.trainer.main_eval data.path="$OUT"
