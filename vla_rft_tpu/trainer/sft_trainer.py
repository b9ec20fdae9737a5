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


class VLAAdapterSFTTrainer:
    """Full VLA-Adapter fine-tuning stage with a TRAINABLE VLM
    (openvla-oft/vla-scripts/finetune.py: the backbone is optimized together
    with the action head; flags mirror finetune's freeze switches).

    Loss = flow-matching BC (same as VLAFlowSFTTrainer) but the gradient
    flows through encode_context into the VLM.  optax.multi_transform masks
    frozen subtrees (vision towers / the whole LLM) to zero updates — the
    functional analog of finetune.py's requires_grad_ switches; LoRA's role
    (cheap adaptation) is covered by freezing the backbone and training
    projector+head only.
    """

    def __init__(
        self,
        vla,
        expert: ActionExpert,
        vla_params,
        expert_params,
        lr: float = 2e-5,
        expert_lr: float = 1e-4,
        grad_clip: float = 1.0,
        freeze_vision_backbone: bool = False,
        freeze_llm: bool = False,
        mesh=None,
    ):
        from vla_rft_tpu.workers import flow_actor

        self.vla, self.expert = vla, expert
        self.params = {"vla": vla_params, "expert": expert_params}
        self._flow_actor = flow_actor

        def label(path_leaf):
            path = jax.tree_util.keystr(path_leaf)
            if path.startswith("['expert']"):
                return "expert"
            # module names from models/prismatic.py: 'featurizer' (DINOv2),
            # 'fused_featurizer' (SigLIP), 'language_model' (Qwen backbone)
            if freeze_vision_backbone and "featurizer" in path:
                return "frozen"
            if freeze_llm and "language_model" in path:
                return "frozen"
            return "vla"

        labels = jax.tree_util.tree_map_with_path(
            lambda p, _: label(p), self.params
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.multi_transform(
                {
                    "vla": optax.adamw(lr),
                    "expert": optax.adamw(expert_lr),
                    "frozen": optax.set_to_zero(),
                },
                labels,
            ),
        )
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._train_step)

    def _loss(self, params, batch, noise_dict):
        hidden = self._flow_actor.encode_context(self.vla, params["vla"], batch)
        flow_pred = self.expert.apply(
            params["expert"], hidden, noise_dict["gt_noisy_actions"],
            noise_dict["gt_timesteps"].astype(jnp.float32), batch["proprio"],
            method=self.expert.predict_flow,
        )
        return jnp.mean(
            (flow_pred.astype(jnp.float32) - noise_dict["flow"].astype(jnp.float32)) ** 2
        )

    def _train_step(self, params, opt_state, rng, batch):
        noise_dict = sample_noisy_actions(rng, batch["actions"], self.expert.cfg)
        loss, grads = jax.value_and_grad(self._loss)(params, batch, noise_dict)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def training_step(self, rng, batch: Dict[str, Any]) -> float:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, rng, batch
        )
        return float(loss)


class PrismaticAlignTrainer:
    """The legacy prismatic PRETRAINING 'align' stage (reference
    prismatic/training strategies + vlms/prismatic.py: stage='align' trains
    ONLY the projector on image-caption next-token loss, vision towers and
    LLM frozen).  Completes the pretraining-stage surface next to
    VLAAdapterSFTTrainer (the 'finetune' analog).

    Loss: cross-entropy over caption tokens where labels != IGNORE_INDEX,
    from OpenVLA.lm_forward (patches after BOS, no action queries).
    """

    def __init__(self, vla, vla_params, lr: float = 1e-3, grad_clip: float = 1.0):
        self.vla = vla
        self.params = vla_params

        def label(path_leaf):
            return (
                "projector"
                if "projector" in jax.tree_util.keystr(path_leaf)
                else "frozen"
            )

        labels = jax.tree_util.tree_map_with_path(lambda p, _: label(p), self.params)
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.multi_transform(
                {"projector": optax.adamw(lr), "frozen": optax.set_to_zero()},
                labels,
            ),
        )
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._train_step)

    def _loss(self, params, batch):
        from vla_rft_tpu.models.action_masks import IGNORE_INDEX

        logits = self.vla.apply(
            params, batch["input_ids"], batch["pixel_values"],
            batch["attention_mask"], method=self.vla.lm_forward,
        )  # (B, S, V); position i predicts token i+1
        labels = batch["labels"][:, 1:]
        lp = logprobs_from_logits(
            logits[:, :-1].astype(jnp.float32), jnp.maximum(labels, 0)
        )
        mask = (labels != IGNORE_INDEX).astype(jnp.float32)
        return -(lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def _train_step(self, params, opt_state, batch):
        loss, grads = jax.value_and_grad(self._loss)(params, batch)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def training_step(self, batch: Dict[str, Any]) -> float:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch
        )
        return float(loss)
