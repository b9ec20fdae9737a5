"""SFT trainers.

* SFTTrainer — text SFT, port of verl's FSDPSFTTrainer
  (train/verl/verl/trainer/fsdp_sft_trainer.py:79-550): masked cross-entropy
  over labels, AdamW with warmup/clip, params fsdp-sharded on the mesh
  (FSDP wrap + Ulysses SP collapse into sharding annotations here).
* VLAFlowSFTTrainer — the VLA-Adapter fine-tuning stage
  (openvla-oft/vla-scripts/finetune.py): flow-matching behavior cloning —
  sample t~Beta(1.5,1), x_t=(1-t)*noise+t*a, regress the DiT flow against
  u = noise - a (action_heads.py:63-96) with the VLM frozen.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_rft_tpu.models.action_head import ActionExpert, sample_noisy_actions
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.ops.masked import logprobs_from_logits
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh, shard_params_fsdp


class SFTTrainer:
    def __init__(self, llm_cfg: TransformerConfig, lr=1e-5, weight_decay=0.01,
                 grad_clip=1.0, warmup_steps=0, total_steps=1000, mesh=None, seed=0):
        self.llm = Decoder(llm_cfg)
        self.mesh = mesh or make_mesh(MeshConfig())
        self.params = shard_params_fsdp(
            self.mesh, self.llm.init(jax.random.key(seed), jnp.zeros((1, 8), jnp.int32))
        )
        sched = (
            optax.warmup_constant_schedule(0.0, lr, warmup_steps) if warmup_steps else lr
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(sched, weight_decay=weight_decay),
        )
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._train_step)

    def _loss(self, params, batch):
        """Masked next-token CE (fsdp_sft_trainer training_step)."""
        input_ids = batch["input_ids"]
        labels = batch["labels"]
        kv_lens = batch["attention_mask"].sum(-1).astype(jnp.int32)
        logits, _, _ = self.llm.apply(params, input_ids, kv_lens=kv_lens)
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        mask = (shift_labels != -100).astype(jnp.float32)
        lp = logprobs_from_logits(shift_logits, jnp.clip(shift_labels, 0, None))
        return -(lp * mask).sum() / jnp.clip(mask.sum(), 1, None)

    def _train_step(self, params, opt_state, batch):
        loss, grads = jax.value_and_grad(self._loss)(params, batch)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def training_step(self, batch: Dict[str, np.ndarray]) -> float:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, loss = self._step(self.params, self.opt_state, batch)
        return float(loss)


class VLAFlowSFTTrainer:
    """Flow-matching BC over precomputed frozen-VLM contexts."""

    def __init__(self, expert: ActionExpert, expert_params, lr=1e-4, grad_clip=1.0, seed=0):
        self.expert = expert
        self.params = expert_params
        self.tx = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adamw(lr))
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._train_step)

    def _loss(self, params, hidden, gt_actions, proprio, noise_dict):
        flow_pred = self.expert.apply(
            params, hidden, noise_dict["gt_noisy_actions"],
            noise_dict["gt_timesteps"].astype(jnp.float32), proprio,
            method=self.expert.predict_flow,
        )
        return jnp.mean(
            (flow_pred.astype(jnp.float32) - noise_dict["flow"].astype(jnp.float32)) ** 2
        )

    def _train_step(self, params, opt_state, rng, hidden, gt_actions, proprio):
        noise_dict = sample_noisy_actions(rng, gt_actions, self.expert.cfg)
        loss, grads = jax.value_and_grad(self._loss)(
            params, hidden, gt_actions, proprio, noise_dict
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def training_step(self, rng, hidden, gt_actions, proprio) -> float:
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, rng, hidden, gt_actions, proprio
        )
        return float(loss)
