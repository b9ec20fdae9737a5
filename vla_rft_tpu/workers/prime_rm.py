"""Implicit process reward model worker (PRIME).

Port of train/verl/recipe/prime/prime_dp_rm.py (DataParallelPRIMERewardModel):
the "reward model" is a causal LM; each response token's process score is
beta-free log p_rm(token) - log p_ref(token), optionally collapsed to the
last valid token ("whole" granularity), batch-normalized, and the RM is
trained online with the CE-DPO loss against outcome correctness.

TPU shape: score + update are two jitted stages over the same mesh-sharded
Decoder params; no FSDP wrapper or optimizer offload plumbing needed.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.trainer import prime_core
from vla_rft_tpu.workers.llm_rollout import compute_log_probs


@dataclasses.dataclass
class PRIMERMConfig:
    response_length: int
    beta: float = 0.05
    granularity: str = "token"  # 'token' | 'whole'
    norm_mode: str = "batch_norm"
    loss_type: str = "ce"  # 'ce' | 'dpo'
    bon_mode: str = "none"
    lr: float = 1e-6
    grad_clip: float = 10.0
    n_samples: int = 4


class PRIMERewardWorker:
    def __init__(self, llm_cfg: TransformerConfig, cfg: PRIMERMConfig, params, ref_params):
        self.llm = Decoder(llm_cfg)
        self.cfg = cfg
        self.params = params
        self.ref_params = ref_params
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip), optax.adamw(cfg.lr)
        )
        self.opt_state = self.tx.init(self.params)
        R = cfg.response_length

        def token_scores(p, input_ids, attention_mask, position_ids, old_ref_logp=None):
            lp, _ = compute_log_probs(
                self.llm, p, input_ids, attention_mask, position_ids, R, 1.0
            )
            ref = old_ref_logp
            if ref is None:
                ref, _ = compute_log_probs(
                    self.llm, self.ref_params, input_ids, attention_mask, position_ids, R, 1.0
                )
            scores = lp - ref  # (B, R) implicit process reward
            mask = attention_mask[:, -R:].astype(jnp.float32)
            if cfg.granularity == "whole":
                last = jnp.maximum(mask.sum(-1).astype(jnp.int32) - 1, 0)
                total = (scores * mask).sum(-1)
                scores = jnp.zeros_like(scores).at[
                    jnp.arange(scores.shape[0]), last
                ].set(total)
            return scores * mask, mask

        @jax.jit
        def score_fn(p, input_ids, attention_mask, position_ids):
            s, _ = token_scores(p, input_ids, attention_mask, position_ids)
            return prime_core.prime_norm(s, cfg.norm_mode)

        @jax.jit
        def update_fn(p, opt_state, batch):
            def loss_fn(pp):
                s, mask = token_scores(
                    pp, batch["input_ids"], batch["attention_mask"],
                    batch["position_ids"], batch.get("ref_log_probs"),
                )
                acc = batch["acc"]
                if cfg.loss_type == "ce":
                    loss = prime_core.compute_ce_dpo_loss_rm(s, acc, mask, cfg.beta)
                else:
                    q = (s * mask).sum(-1)
                    q_bc = q.reshape(-1, cfg.n_samples)
                    q_bc = jnp.repeat(q_bc, cfg.n_samples, axis=0).reshape(
                        q.shape[0], cfg.n_samples
                    )
                    acc_bc = acc.reshape(-1, cfg.n_samples)
                    acc_bc = jnp.repeat(acc_bc, cfg.n_samples, axis=0).reshape(
                        q.shape[0], cfg.n_samples
                    )
                    loss = prime_core.compute_detach_dpo_loss_rm(
                        s, acc, jax.lax.stop_gradient(q_bc), acc_bc, mask,
                        cfg.beta, cfg.bon_mode,
                    )
                metrics = {
                    "prime/rm_loss": loss,
                    "prime/dpo_acc": prime_core.compute_dpo_accuracy(
                        s, acc, mask, cfg.n_samples
                    ),
                }
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, opt_state = self.tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, metrics

        self._score = score_fn
        self._update = update_fn

    def compute_rm_score(self, input_ids, attention_mask, position_ids) -> jnp.ndarray:
        return self._score(self.params, input_ids, attention_mask, position_ids)

    def update_rm(self, batch: Dict) -> Dict[str, float]:
        self.params, self.opt_state, metrics = self._update(
            self.params, self.opt_state, batch
        )
        return {k: float(v) for k, v in metrics.items()}
