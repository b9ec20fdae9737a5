"""CLI entrypoint for supervised fine-tuning.

Counterpart of verl's torchrun entrypoint (train/verl/verl/trainer/
fsdp_sft_trainer.py:79-550 `main`) and of the VLA-Adapter pretraining stage
(vla-adapter/openvla-oft/vla-scripts/finetune.py), selected by sft.mode:

  text      masked-CE SFT of a Decoder on a parquet of prompt/response
            columns (data.train_files; HF tokenizer from model.ckpt_path)
  vla_flow  flow-matching behavior cloning of the action expert on LIBERO
            RLDS data (data.video.dataset_path) or synthetic data when no
            dataset is configured — the VLM stays frozen; contexts are
            encoded once per batch

Usage (dotted overrides like every other entrypoint):
  python -m vla_rft_tpu.trainer.main_sft sft.mode=vla_flow \
      trainer.total_training_steps=100 [--preset=tiny]
"""
from __future__ import annotations

import sys
import time


def run(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    preset = "libero"
    if "--preset=tiny" in argv:
        preset = "tiny"
        argv.remove("--preset=tiny")

    from vla_rft_tpu.config import vla_rft_default_config

    config = vla_rft_default_config().apply_overrides([a for a in argv if "=" in a])
    mode = config.get("sft", {}).get("mode", "vla_flow") if hasattr(
        config, "get"
    ) else "vla_flow"
    for a in argv:
        if a.startswith("sft.mode="):
            mode = a.split("=", 1)[1]
    steps = config.trainer.total_training_steps

    if mode == "text":
        _run_text(config, steps)
    elif mode == "vla_flow":
        _run_vla_flow(config, preset, steps)
    elif mode == "vla_adapter":
        _run_vla_adapter(config, preset, steps)
    elif mode == "vla_align":
        _run_vla_align(config, preset, steps)
    else:
        raise SystemExit(
            f"unknown sft.mode {mode!r} (text | vla_flow | vla_adapter | vla_align)"
        )


class SFTParquetDataset:
    """prompt/response parquet -> (input_ids, labels, attention_mask) with
    labels masked (-100) over the prompt (fsdp_sft_trainer's SFTDataset
    tokenize-and-mask semantics)."""

    def __init__(self, parquet_files, tokenizer, prompt_key="prompt",
                 response_key="response", max_length=512, batch_size=8, seed=0):
        import numpy as np
        import pandas as pd

        from vla_rft_tpu.utils.fs import copy_to_local

        files = parquet_files if isinstance(parquet_files, (list, tuple)) else [parquet_files]
        self.df = pd.concat([pd.read_parquet(copy_to_local(f)) for f in files])
        self.tokenizer = tokenizer
        self.prompt_key, self.response_key = prompt_key, response_key
        self.max_length, self.batch_size = max_length, batch_size
        self.rng = np.random.default_rng(seed)
        self.pad = tokenizer.pad_token_id or 0

    def next_batch(self):
        import numpy as np

        rows = self.df.sample(self.batch_size, random_state=int(self.rng.integers(1 << 31)))
        L = self.max_length
        ids = np.full((len(rows), L), self.pad, np.int32)
        labels = np.full((len(rows), L), -100, np.int32)
        attn = np.zeros((len(rows), L), np.int32)
        for i, (_, row) in enumerate(rows.iterrows()):
            p = self.tokenizer.encode(str(row[self.prompt_key]))
            r = self.tokenizer.encode(str(row[self.response_key])) + [
                self.tokenizer.eos_token_id or self.pad
            ]
            seq = (p + r)[:L]
            ids[i, : len(seq)] = seq
            attn[i, : len(seq)] = 1
            labels[i, min(len(p), L) : len(seq)] = seq[min(len(p), L) :]
        return {"input_ids": ids, "labels": labels, "attention_mask": attn}


def _run_text(config, steps):
    from transformers import AutoTokenizer

    from vla_rft_tpu.models.transformer import TransformerConfig
    from vla_rft_tpu.trainer.sft_trainer import SFTTrainer

    model_path = config.actor_rollout_ref.model.ckpt_path
    if not model_path:
        raise SystemExit("actor_rollout_ref.model.ckpt_path is required for text SFT")
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    llm_cfg = TransformerConfig.qwen25_0_5b()
    trainer = SFTTrainer(
        llm_cfg,
        lr=config.actor_rollout_ref.actor.optim.lr,
        total_steps=steps,
    )
    dataset = SFTParquetDataset(
        config.data.get("train_files"),
        tokenizer,
        prompt_key=config.data.get("prompt_key", "prompt"),
        response_key=config.data.get("response_key", "response"),
        max_length=config.data.get("max_prompt_length", 256)
        + config.data.get("max_response_length", 256),
        batch_size=config.data.train_batch_size,
    )
    for step in range(1, steps + 1):
        t0 = time.time()
        loss = trainer.training_step(dataset.next_batch())
        print(f"[sft step {step}] loss {loss:.4f} ({time.time()-t0:.2f}s)", flush=True)


def _run_vla_flow(config, preset, steps):
    import jax
    import jax.numpy as jnp

    from vla_rft_tpu.data.synthetic import SyntheticVLAConfig, SyntheticVLADataset
    from vla_rft_tpu.models.factory import build_models, fast_random_params
    from vla_rft_tpu.trainer.sft_trainer import VLAFlowSFTTrainer
    from vla_rft_tpu.workers import flow_actor

    bundle = build_models(config, preset)
    params = fast_random_params(bundle, config.trainer.get("seed", 0))
    dataset = SyntheticVLADataset(
        SyntheticVLAConfig(
            batch_size=config.data.train_batch_size,
            seq_len=bundle.policy_seq_len,
            num_action_tokens=bundle.vla_cfg.num_tokens,
            policy_image_size=bundle.policy_image_size,
            wm_image_size=bundle.wm_image_size,
            num_frames=bundle.num_raw_frames,
            action_chunk=bundle.expert_cfg.num_actions_chunk,
            action_dim=bundle.expert_cfg.action_dim,
            proprio_dim=bundle.vla_cfg.proprio_dim,
            num_images=bundle.vla_cfg.num_images,
            seed=config.trainer.get("seed", 0),
        )
    )

    @jax.jit
    def encode(vla_params, batch):
        return flow_actor.encode_context(bundle.vla, vla_params, batch)

    trainer = VLAFlowSFTTrainer(
        bundle.expert, params["expert"], lr=config.actor_rollout_ref.actor.optim.lr
    )
    rng = jax.random.key(config.trainer.get("seed", 0))
    for step in range(1, steps + 1):
        t0 = time.time()
        b = {k: jnp.asarray(v) for k, v in dataset.next_batch().items()}
        hidden = encode(
            params["vla"],
            {
                "input_ids": b["input_ids"],
                "attention_mask": b["attention_mask"],
                "labels": b["labels"],
                "pixels": b["pixel_values"],
            },
        )
        rng, sub = jax.random.split(rng)
        loss = trainer.training_step(sub, hidden, b["actions"], b["proprio"])
        print(f"[sft step {step}] flow_bc_loss {loss:.4f} ({time.time()-t0:.2f}s)", flush=True)


def _run_vla_adapter(config, preset, steps):
    """finetune.py parity mode: flow BC that ALSO updates the VLM backbone
    (sft.freeze_vision_backbone / sft.freeze_llm mirror its switches)."""
    import jax
    import jax.numpy as jnp

    from vla_rft_tpu.data.synthetic import SyntheticVLAConfig, SyntheticVLADataset
    from vla_rft_tpu.models.factory import build_models, fast_random_params
    from vla_rft_tpu.trainer.sft_trainer import VLAAdapterSFTTrainer

    bundle = build_models(config, preset)
    params = fast_random_params(bundle, config.trainer.get("seed", 0))
    sft = config.get("sft", {})
    dataset = SyntheticVLADataset(
        SyntheticVLAConfig(
            batch_size=config.data.train_batch_size,
            seq_len=bundle.policy_seq_len,
            num_action_tokens=bundle.vla_cfg.num_tokens,
            policy_image_size=bundle.policy_image_size,
            wm_image_size=bundle.wm_image_size,
            num_frames=bundle.num_raw_frames,
            action_chunk=bundle.expert_cfg.num_actions_chunk,
            action_dim=bundle.expert_cfg.action_dim,
            proprio_dim=bundle.vla_cfg.proprio_dim,
            num_images=bundle.vla_cfg.num_images,
            seed=config.trainer.get("seed", 0),
        )
    )
    trainer = VLAAdapterSFTTrainer(
        bundle.vla, bundle.expert, params["vla"], params["expert"],
        lr=float(sft.get("vlm_lr", 2e-5) if hasattr(sft, "get") else 2e-5),
        expert_lr=config.actor_rollout_ref.actor.optim.lr,
        freeze_vision_backbone=bool(
            sft.get("freeze_vision_backbone", False) if hasattr(sft, "get") else False
        ),
        freeze_llm=bool(sft.get("freeze_llm", False) if hasattr(sft, "get") else False),
    )
    rng = jax.random.key(config.trainer.get("seed", 0))
    for step in range(1, steps + 1):
        t0 = time.time()
        b = {k: jnp.asarray(v) for k, v in dataset.next_batch().items()}
        rng, sub = jax.random.split(rng)
        loss = trainer.training_step(
            sub,
            {
                "input_ids": b["input_ids"],
                "attention_mask": b["attention_mask"],
                "labels": b["labels"],
                "pixels": b["pixel_values"],
                "proprio": b["proprio"],
                "actions": b["actions"],
            },
        )
        print(f"[sft step {step}] adapter_bc_loss {loss:.4f} ({time.time()-t0:.2f}s)", flush=True)


def _run_vla_align(config, preset, steps):
    """Legacy prismatic PRETRAINING 'align' stage: projector-only training
    on image-caption next-token loss (reference prismatic/training
    strategies, stage='align').  Real LLaVA chat-JSON caption data when
    sft.chat_json is set (data/caption.py AlignCaptionDataset — reference
    AlignDataset format); synthetic captions otherwise."""
    import jax.numpy as jnp
    import numpy as np

    from vla_rft_tpu.data.synthetic import SyntheticVLAConfig, SyntheticVLADataset
    from vla_rft_tpu.models.action_masks import IGNORE_INDEX
    from vla_rft_tpu.models.factory import build_models, fast_random_params
    from vla_rft_tpu.trainer.sft_trainer import PrismaticAlignTrainer

    bundle = build_models(config, preset)
    params = fast_random_params(bundle, config.trainer.get("seed", 0))
    sft = config.get("sft", {})
    chat_json = sft.get("chat_json", None) if hasattr(sft, "get") else None
    if chat_json:
        from transformers import AutoTokenizer

        from vla_rft_tpu.data.caption import get_caption_dataset

        tok = AutoTokenizer.from_pretrained(config.actor_rollout_ref.model.path)
        cap_ds = get_caption_dataset(
            sft.get("stage", "align"),
            json_path=chat_json,
            image_dir=sft.get("image_dir", "."),
            tokenizer=tok,
            image_size=bundle.policy_image_size,
            batch_size=config.data.train_batch_size,
            seq_len=bundle.policy_seq_len,
            pad_token_id=tok.pad_token_id or 0,
            seed=config.trainer.get("seed", 0),
        )
        trainer = PrismaticAlignTrainer(
            bundle.vla, params["vla"], lr=float(sft.get("projector_lr", 1e-3)),
        )
        for step in range(1, steps + 1):
            t0 = time.time()
            b = cap_ds.next_batch()
            loss = trainer.training_step(
                {k: b[k] for k in ("input_ids", "pixel_values", "attention_mask", "labels")}
            )
            print(f"[align {step}] loss {loss:.4f}  ({time.time()-t0:.2f}s)", flush=True)
        return
    dataset = SyntheticVLADataset(
        SyntheticVLAConfig(
            batch_size=config.data.train_batch_size,
            seq_len=bundle.policy_seq_len,
            num_action_tokens=bundle.vla_cfg.num_tokens,
            policy_image_size=bundle.policy_image_size,
            wm_image_size=bundle.wm_image_size,
            num_frames=bundle.num_raw_frames,
            action_chunk=bundle.expert_cfg.num_actions_chunk,
            action_dim=bundle.expert_cfg.action_dim,
            proprio_dim=bundle.vla_cfg.proprio_dim,
            num_images=bundle.vla_cfg.num_images,
            seed=config.trainer.get("seed", 0),
        )
    )
    trainer = PrismaticAlignTrainer(
        bundle.vla, params["vla"],
        lr=float(sft.get("projector_lr", 1e-3) if hasattr(sft, "get") else 1e-3),
    )
    for step in range(1, steps + 1):
        t0 = time.time()
        b = dataset.next_batch()
        am = np.asarray(b["attention_mask"])
        ids = np.asarray(b["input_ids"])
        # caption supervision: predict the valid tokens after the first
        # quarter of each row (a prompt/caption split stand-in)
        labels = np.where(am > 0, ids, IGNORE_INDEX)
        cut = max(1, ids.shape[1] // 4)
        labels[:, :cut] = IGNORE_INDEX
        loss = trainer.training_step(
            {
                "input_ids": ids,
                "pixel_values": b["pixel_values"],
                "attention_mask": am,
                "labels": labels,
            }
        )
        print(f"[align {step}] loss {loss:.4f}  ({time.time()-t0:.2f}s)", flush=True)



if __name__ == "__main__":
    run()
