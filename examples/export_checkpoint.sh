#!/usr/bin/env bash
# Export trained weights back to torch state dicts (reference:
# scripts/model_merger.py merging FSDP shards to HF).
#
# RFT checkpoints (trainer.default_local_dir/global_step_N) contain the
# TRAINED collection only — the action expert (action head + projectors +
# sigma net; the VLM and WM are frozen, load them from their original
# sources).  For a WM/LLM exported from a converted .npz use
# `decoder --arch wm_llama`.
set -x
PYTHONPATH=. python3 tools/export_weights.py expert \
    --ckpt ${CKPT:?path to global_step_N dir} \
    --collection expert --out ${OUT:-action_expert.pt} "$@"
