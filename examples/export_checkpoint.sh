#!/usr/bin/env bash
# Export a trained orbax checkpoint back to an HF/torch state dict
# (reference: scripts/model_merger.py merging FSDP shards to HF).
set -x
PYTHONPATH=. python3 tools/export_weights.py decoder \
    --ckpt ${CKPT:?} --collection wm --arch wm_llama --out ${OUT:-wm_hf.pt} "$@"
