"""Batch generation CLI.

Counterpart of train/verl/verl/trainer/main_generation.py: load prompts from
a parquet file, generate n samples each with the scan rollout, write
responses back to parquet.
"""
from __future__ import annotations

import sys


def run(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from vla_rft_tpu.config import vla_rft_default_config

    config = vla_rft_default_config().apply_overrides([a for a in argv if "=" in a])

    import glob
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from transformers import AutoTokenizer

    from tools.convert_weights import convert_hf_decoder
    from vla_rft_tpu.data.rlhf_dataset import RLHFDataset
    from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
    from vla_rft_tpu.workers.llm_rollout import LLMRolloutConfig, generate_sequences

    model_path = config.actor_rollout_ref.model.ckpt_path
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    llm_cfg = TransformerConfig.qwen25_0_5b()
    llm = Decoder(llm_cfg)

    import safetensors.numpy as stn

    sd = {}
    for f in glob.glob(os.path.join(model_path, "*.safetensors")):
        sd.update(stn.load_file(f))
    params = jax.device_put(convert_hf_decoder(sd, llm_cfg))

    ds = RLHFDataset(
        config.data.get("train_files"), tokenizer,
        max_prompt_length=config.data.get("max_prompt_length", 256),
        pad_token_id=tokenizer.pad_token_id or 0,
    )
    roll = LLMRolloutConfig(
        response_length=config.actor_rollout_ref.rollout.response_length,
        temperature=config.actor_rollout_ref.rollout.temperature,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id or 0,
    )
    gen = jax.jit(lambda p, r, ids: generate_sequences(llm, p, r, ids, roll))

    n = config.actor_rollout_ref.rollout.n
    rows = []
    rng = jax.random.key(0)
    bs = config.data.train_batch_size
    for start in range(0, len(ds), bs):
        batch = ds.sample_batch(min(bs, len(ds) - start))
        prompts = jnp.repeat(jnp.asarray(batch["input_ids"], jnp.int32), n, axis=0)
        rng, sub = jax.random.split(rng)
        out = gen(params, sub, prompts)
        resp = np.asarray(out["responses"])
        mask = np.asarray(out["response_mask"])
        for i in range(resp.shape[0]):
            k = int(mask[i].sum())
            rows.append({"response": tokenizer.decode(resp[i, :k].tolist())})
    out_path = config.data.get("output_path", "generations.parquet")
    pd.DataFrame(rows).to_parquet(out_path)
    print(f"wrote {len(rows)} generations to {out_path}")


if __name__ == "__main__":
    run()
