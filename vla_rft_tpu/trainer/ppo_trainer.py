"""Generic text-RL PPO trainer (retained verl capability).

Port of RayPPOTrainer.fit (train/verl/verl/trainer/ppo/ray_trainer.py:804-1002):
generate -> uid groups -> response_mask -> old/ref logp -> values -> reward
(rule scorers) -> optional KL-in-reward -> advantage (GAE/GRPO/RLOO/...) ->
update critic -> update actor.  All compute phases are jitted stages over the
mesh; the reward manager runs host-side on decoded text exactly like the
reference's reward workers.

Unlike the VLA path (frozen VLM), here the FULL policy LLM trains: AdamW over
the fsdp-sharded Decoder params with global-norm clipping.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_rft_tpu.config import Config
from vla_rft_tpu.models.critic import CriticModel, compute_values
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.parallel.mesh import make_mesh, MeshConfig, shard_params_fsdp
from vla_rft_tpu.trainer import core_algos
from vla_rft_tpu.utils.timers import timer, timing_metrics
from vla_rft_tpu.utils.tracking import Tracking, append_to_dict, reduce_metrics
from vla_rft_tpu.workers.llm_rollout import LLMRolloutConfig, compute_log_probs, generate_sequences
from vla_rft_tpu.workers.reward_manager import NaiveRewardManager


class PPOTrainer:
    def __init__(
        self,
        config: Config,
        llm_cfg: TransformerConfig,
        tokenizer,
        dataset,
        critic_cfg: Optional[TransformerConfig] = None,
        mesh=None,
        reward_manager: Optional[NaiveRewardManager] = None,
        rm_cfg: Optional[TransformerConfig] = None,
        seed: int = 0,
    ):
        self.config = config
        self.llm = Decoder(llm_cfg)
        self.use_critic = config.algorithm.adv_estimator == "gae"
        self.critic = CriticModel(critic_cfg or llm_cfg) if self.use_critic else None
        # model-based RM (RewardModelWorker, verl/workers/fsdp_workers.py:1417):
        # scores samples whose data source has no rule scorer; rule scorers
        # keep precedence (reward_manager/naive.py rm_scores fallback)
        self.rm = None
        self.prime_rm = None
        if config.get_path("reward_model.enable", False):
            if config.get_path("reward_model.rm_type", "value_head") == "prime":
                # built after actor params exist (ref = initial policy);
                # see end of __init__
                pass
            else:
                from vla_rft_tpu.models.reward_model import SequenceRewardModel

                self.rm = SequenceRewardModel(rm_cfg or llm_cfg)
        self.tokenizer = tokenizer
        self.dataset = dataset
        self.mesh = mesh or make_mesh(MeshConfig(**config.mesh.to_dict()))
        self.reward_manager = reward_manager or NaiveRewardManager(tokenizer)

        roll = config.actor_rollout_ref.rollout
        self.roll_cfg = LLMRolloutConfig(
            response_length=roll.response_length,
            temperature=roll.temperature,
            top_k=roll.get("top_k", -1),
            top_p=roll.get("top_p", 1.0),
            do_sample=roll.get("do_sample", True),
            eos_token_id=config.processor.get("eos_token_id", 2),
            pad_token_id=config.processor.get("pad_token_id", 0),
        )
        self.global_steps = 0
        self._seed = seed

        rng = jax.random.key(seed)
        dummy = jnp.zeros((1, 8), jnp.int32)
        self.actor_params = shard_params_fsdp(self.mesh, self.llm.init(rng, dummy))
        self.ref_params = jax.tree_util.tree_map(lambda x: x, self.actor_params)
        optim = config.actor_rollout_ref.actor.optim
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(config.actor_rollout_ref.actor.grad_clip),
            optax.adamw(optim.get("lr", 1e-6), weight_decay=optim.get("weight_decay", 0.01)),
        )
        self.actor_opt_state = self.actor_tx.init(self.actor_params)
        if self.rm is not None:
            self.rm_params = shard_params_fsdp(
                self.mesh, self.rm.init(jax.random.key(seed + 2), dummy)
            )
        if self.use_critic:
            self.critic_params = shard_params_fsdp(
                self.mesh, self.critic.init(jax.random.key(seed + 1), dummy)
            )
            self.critic_tx = optax.chain(
                optax.clip_by_global_norm(config.critic.get("grad_clip", 1.0)),
                optax.adamw(config.critic.optim.get("lr", 1e-5)),
            )
            self.critic_opt_state = self.critic_tx.init(self.critic_params)
        if (
            config.get_path("reward_model.enable", False)
            and config.get_path("reward_model.rm_type", "value_head") == "prime"
        ):
            # PRIME: the RM is an LM initialized from (and referenced against)
            # the starting policy (recipe/prime/prime_fsdp_workers.py)
            from vla_rft_tpu.workers.prime_rm import PRIMERMConfig, PRIMERewardWorker

            rmc = config.reward_model
            self.prime_rm = PRIMERewardWorker(
                llm_cfg,
                PRIMERMConfig(
                    response_length=self.roll_cfg.response_length,
                    beta=rmc.get("beta_train", 0.05),
                    granularity=rmc.get("prime_granularity", "token"),
                    norm_mode=rmc.get("prime_norm", "batch_norm"),
                    loss_type=rmc.get("loss_type", "ce"),
                    lr=rmc.get("lr", 1e-6),
                    n_samples=config.actor_rollout_ref.rollout.n,
                ),
                jax.tree_util.tree_map(lambda x: x, self.actor_params),
                jax.tree_util.tree_map(lambda x: x, self.actor_params),
            )
        self._build_stage_fns()

    # ------------------------------------------------------------------ stages
    def _build_stage_fns(self):
        cfg = self.config
        actor_cfg = cfg.actor_rollout_ref.actor
        R = self.roll_cfg.response_length
        temp = self.roll_cfg.temperature

        # sglang-analog prompt-prefix sharing: the n GRPO rollouts of each
        # prompt share one prefilled prompt KV (rows are repeat-contiguous)
        share_n = (
            cfg.actor_rollout_ref.rollout.n
            if cfg.actor_rollout_ref.rollout.get("prefix_share", False)
            else 1
        )

        @jax.jit
        def gen_fn(params, rng, prompts):
            return generate_sequences(
                self.llm, params, rng, prompts, self.roll_cfg,
                prefix_share_n=share_n,
            )

        import dataclasses as _dc

        greedy_cfg = _dc.replace(self.roll_cfg, do_sample=False)

        @jax.jit
        def gen_greedy_fn(params, rng, prompts):
            # ReMax baseline: greedy rollout of the same prompts
            # (ray_trainer.py remax branch / core_algos compute_remax_*)
            return generate_sequences(self.llm, params, rng, prompts, greedy_cfg)

        @jax.jit
        def logp_fn(params, input_ids, attention_mask, position_ids):
            lp, ent = compute_log_probs(
                self.llm, params, input_ids, attention_mask, position_ids, R, temp
            )
            return lp

        @jax.jit
        def rm_fn(params, input_ids, attention_mask, position_ids):
            from vla_rft_tpu.models.reward_model import compute_rm_score

            return compute_rm_score(
                self.rm, params, input_ids, attention_mask, position_ids, R
            )

        @jax.jit
        def values_fn(params, input_ids, attention_mask, position_ids):
            return compute_values(
                self.critic, params, input_ids, attention_mask, position_ids, R
            ) if self.critic else None

        clip_low = actor_cfg.get("clip_ratio_low", None) or actor_cfg.clip_ratio
        clip_high = actor_cfg.get("clip_ratio_high", None) or actor_cfg.clip_ratio

        @jax.jit
        def actor_update_fn(params, opt_state, mb):
            def loss_fn(p):
                from vla_rft_tpu.ops.masked import entropy_from_logits, logprobs_from_logits

                lp, ent = compute_log_probs(
                    self.llm, p, mb["input_ids"], mb["attention_mask"],
                    mb["position_ids"], R, temp,
                )
                mask = mb["response_mask"].astype(jnp.float32)
                pg_loss, clipfrac, ppo_kl, clip_lower = core_algos.compute_policy_loss(
                    mb["old_log_probs"], lp, mb["advantages"], mask,
                    cliprange=actor_cfg.clip_ratio, cliprange_low=clip_low,
                    cliprange_high=clip_high,
                    clip_ratio_c=actor_cfg.get("clip_ratio_c", 3.0),
                    loss_agg_mode=actor_cfg.loss_agg_mode,
                )
                ent_loss = core_algos.agg_loss(ent, mask, actor_cfg.loss_agg_mode)
                loss = pg_loss - actor_cfg.entropy_coeff * ent_loss
                if actor_cfg.get("use_kl_loss", False):
                    kld = core_algos.kl_penalty(lp, mb["ref_log_probs"], actor_cfg.kl_loss_type)
                    loss = loss + actor_cfg.kl_loss_coef * core_algos.agg_loss(
                        kld, mask, actor_cfg.loss_agg_mode
                    )
                return loss, {
                    "actor/pg_loss": pg_loss,
                    "actor/entropy": ent_loss,
                    "actor/pg_clipfrac": clipfrac,
                    "actor/ppo_kl": ppo_kl,
                }

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.actor_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["actor/grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        @jax.jit
        def critic_update_fn(params, opt_state, mb):
            def loss_fn(p):
                vpreds = compute_values(
                    self.critic, p, mb["input_ids"], mb["attention_mask"],
                    mb["position_ids"], R,
                )
                vf_loss, vf_clipfrac = core_algos.compute_value_loss(
                    vpreds, mb["returns"], mb["values"],
                    mb["response_mask"].astype(jnp.float32),
                    cfg.critic.get("cliprange_value", 0.5),
                )
                return vf_loss, {"critic/vf_loss": vf_loss, "critic/vf_clipfrac": vf_clipfrac}

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.critic_tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, metrics

        self._gen = gen_fn
        self._gen_greedy = gen_greedy_fn
        self._logp = logp_fn
        self._rm_score = rm_fn
        self._values = values_fn
        self._actor_update = actor_update_fn
        self._critic_update = critic_update_fn

    # -------------------------------------------------------------------- step
    def training_step(self, batch: Dict[str, Any], rng: jax.Array) -> Dict[str, float]:
        cfg = self.config
        algo = cfg.algorithm
        n = cfg.actor_rollout_ref.rollout.n
        metrics: Dict[str, Any] = {}
        timing: Dict[str, float] = {}

        with timer("step", timing):
            prompts = jnp.asarray(batch["input_ids"], jnp.int32)
            B = prompts.shape[0]
            prompts = jnp.repeat(prompts, n, axis=0)
            with timer("gen", timing):
                gen = self._gen(self.actor_params, rng, prompts)

            with timer("old_log_prob", timing):
                old_logp = self._logp(
                    self.actor_params, gen["input_ids"], gen["attention_mask"],
                    gen["position_ids"],
                )
                ref_logp = self._logp(
                    self.ref_params, gen["input_ids"], gen["attention_mask"],
                    gen["position_ids"],
                )

            values = None
            if self.use_critic:
                with timer("values", timing):
                    values = self._values(
                        self.critic_params, gen["input_ids"], gen["attention_mask"],
                        gen["position_ids"],
                    )

            with timer("reward", timing):
                sources = [s for s in batch["data_sources"] for _ in range(n)]
                gts = [g for g in batch["ground_truths"] for _ in range(n)]
                resp = np.asarray(gen["responses"])
                resp_mask_np = np.asarray(gen["response_mask"])
                if self.rm is not None:
                    # model scores everything; rule scorers override rows
                    # whose data source has one (verl naive manager semantics)
                    from vla_rft_tpu.utils.reward_score import has_scorer

                    scores = np.array(
                        self._rm_score(
                            self.rm_params, gen["input_ids"],
                            gen["attention_mask"], gen["position_ids"],
                        )
                    )
                    rule_rows = [i for i, s in enumerate(sources) if has_scorer(s)]
                    if rule_rows:
                        idx = np.asarray(rule_rows)
                        scores[idx] = self.reward_manager(
                            resp[idx], resp_mask_np[idx],
                            [sources[i] for i in rule_rows],
                            [gts[i] for i in rule_rows],
                        )
                else:
                    scores = self.reward_manager(resp, resp_mask_np, sources, gts)
                token_level_scores = jnp.asarray(scores)
                prime_scores = None
                if self.prime_rm is not None:
                    # outcome correctness from the verifier; implicit PRM
                    # scores + online RM update (prime_ray_trainer.fit)
                    acc = token_level_scores.sum(-1)
                    rm_batch = {
                        "input_ids": gen["input_ids"],
                        "attention_mask": gen["attention_mask"],
                        "position_ids": gen["position_ids"],
                        "acc": acc,
                    }
                    if cfg.reward_model.get("update", "after") == "before":
                        metrics.update(self.prime_rm.update_rm(rm_batch))
                        prime_scores = self.prime_rm.compute_rm_score(
                            gen["input_ids"], gen["attention_mask"], gen["position_ids"]
                        )
                    else:
                        prime_scores = self.prime_rm.compute_rm_score(
                            gen["input_ids"], gen["attention_mask"], gen["position_ids"]
                        )
                        metrics.update(self.prime_rm.update_rm(rm_batch))
                if algo.use_kl_in_reward:
                    kld = core_algos.kl_penalty(old_logp, ref_logp, algo.kl_penalty)
                    token_level_rewards = token_level_scores - algo.kl_ctrl.kl_coef * kld
                else:
                    token_level_rewards = token_level_scores

            with timer("adv", timing):
                mask = gen["response_mask"].astype(jnp.float32)
                gids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n)
                est = algo.adv_estimator
                if est == "gae":
                    advantages, returns = core_algos.compute_gae_advantage_return(
                        token_level_rewards, values, mask, algo.gamma, algo.lam
                    )
                elif est == "grpo":
                    advantages, returns = core_algos.compute_grpo_outcome_advantage(
                        token_level_rewards, mask, gids, int(B), uniform_std=algo.uniform_std
                    )
                elif est == "rloo":
                    advantages, returns = core_algos.compute_rloo_outcome_advantage(
                        token_level_rewards, mask, gids, int(B)
                    )
                elif est == "reinforce_plus_plus":
                    advantages, returns = core_algos.compute_reinforce_plus_plus_outcome_advantage(
                        token_level_rewards, mask, algo.gamma
                    )
                elif est == "remax":
                    # greedy-rollout baseline per UNIQUE prompt, repeated xn
                    base_prompts = jnp.asarray(batch["input_ids"], jnp.int32)
                    bgen = self._gen_greedy(
                        self.actor_params, jax.random.fold_in(rng, 1), base_prompts
                    )
                    bscores = self.reward_manager(
                        np.asarray(bgen["responses"]), np.asarray(bgen["response_mask"]),
                        list(batch["data_sources"]), list(batch["ground_truths"]),
                    )
                    reward_baselines = jnp.repeat(
                        jnp.asarray(bscores).sum(-1), n, axis=0
                    )
                    advantages, returns = core_algos.compute_remax_outcome_advantage(
                        token_level_rewards, reward_baselines, mask
                    )
                elif est == "prime":
                    from vla_rft_tpu.trainer import prime_core

                    advantages, returns = prime_core.compute_prime_advantage(
                        mask, n,
                        rm_scores=prime_scores,
                        acc=token_level_scores.sum(-1),
                        reward_dpo_coef=algo.get("reward_dpo_coef", 5.0),
                        reward_gt_coef=algo.get("reward_gt_coef", 5.0),
                    )
                else:
                    raise NotImplementedError(est)

            data = {
                "input_ids": gen["input_ids"],
                "attention_mask": gen["attention_mask"],
                "position_ids": gen["position_ids"],
                "response_mask": gen["response_mask"],
                "old_log_probs": old_logp,
                "ref_log_probs": ref_logp,
                "advantages": advantages,
                "returns": returns,
            }
            if values is not None:
                data["values"] = values

            if cfg.trainer.get("balance_batch", False):
                # _balance_batch (ray_trainer.py:787-802): reorder rows so
                # contiguous dp shards carry near-equal token sums (the dp
                # axis shards dim 0 in row blocks, so partition-contiguous
                # order IS the dispatch layout)
                from vla_rft_tpu.utils.seqlen_balancing import (
                    get_seqlen_balanced_partitions,
                    log_seqlen_unbalance,
                )

                world = int(self.mesh.shape.get("dp", 1)) * int(
                    self.mesh.shape.get("fsdp", 1)
                )
                if world > 1:
                    seqlens = (
                        np.asarray(gen["attention_mask"]).sum(-1).astype(int).tolist()
                    )
                    parts = get_seqlen_balanced_partitions(
                        seqlens, world, equal_size=True
                    )
                    order = np.asarray([j for p in parts for j in p])
                    data = {k: v[order] for k, v in data.items()}
                    metrics.update(
                        log_seqlen_unbalance(seqlens, parts, "global_seqlen")
                    )

            actor_cfg = cfg.actor_rollout_ref.actor
            mini = actor_cfg.ppo_mini_batch_size
            total = data["input_ids"].shape[0]
            acc: Dict[str, list] = {}
            with timer("update", timing):
                for epoch in range(actor_cfg.ppo_epochs):
                    for i in range(0, total, mini):
                        mb = {k: v[i : i + mini] for k, v in data.items()}
                        if self.use_critic:
                            self.critic_params, self.critic_opt_state, cm = self._critic_update(
                                self.critic_params, self.critic_opt_state, mb
                            )
                            append_to_dict(acc, {k: float(v) for k, v in cm.items()})
                        if cfg.trainer.critic_warmup <= self.global_steps:
                            self.actor_params, self.actor_opt_state, am = self._actor_update(
                                self.actor_params, self.actor_opt_state, mb
                            )
                            append_to_dict(acc, {k: float(v) for k, v in am.items()})
            metrics.update(reduce_metrics(acc))
            metrics["critic/score/mean"] = float(token_level_scores.sum(-1).mean())
            metrics["critic/rewards/mean"] = float(token_level_rewards.sum(-1).mean())
            metrics["critic/advantages/mean"] = float(advantages.mean())
            metrics["response_length/mean"] = float(mask.sum(-1).mean())

        metrics.update(timing_metrics(timing))
        return metrics

    # ---------------------------------------------------------------- validate
    def validate(self, rng: Optional[jax.Array] = None) -> Dict[str, float]:
        """_validate parity (ray_trainer.py:516-612): sample each val prompt
        val_kwargs.n times, score with the rule scorers, and aggregate the
        bootstrap best/worst-of-n + majority-vote families per data source
        (process_validation_metrics, metric_utils.py:209-279)."""
        from vla_rft_tpu.trainer.metric_utils import (
            flatten_validation_metrics,
            process_validation_metrics,
        )
        from vla_rft_tpu.utils.reward_score import compute_score_with_info, has_scorer

        cfg = self.config
        ds = getattr(self, "val_dataset", None) or self.dataset
        vk = cfg.actor_rollout_ref.rollout.get("val_kwargs", None)
        n = int(vk.get("n", 1)) if vk is not None else 1
        rng = rng if rng is not None else jax.random.key(self._seed + 99)

        batch = ds.sample_batch(cfg.data.get("val_batch_size", cfg.data.train_batch_size))
        prompts = jnp.repeat(jnp.asarray(batch["input_ids"], jnp.int32), n, axis=0)
        gen = self._gen(self.actor_params, rng, prompts)
        resp = np.asarray(gen["responses"])
        resp_mask = np.asarray(gen["response_mask"])

        sources = [s for s in batch["data_sources"] for _ in range(n)]
        gts = [g for g in batch["ground_truths"] for _ in range(n)]
        sample_inputs = [
            self.tokenizer.decode(np.asarray(batch["input_ids"][i]).tolist())
            for i in range(len(batch["input_ids"]))
            for _ in range(n)
        ]
        infos: Dict[str, list] = {"score": [], "pred": []}
        for i in range(len(sources)):
            nv = int(resp_mask[i].sum())
            text = self.tokenizer.decode(resp[i, :nv].tolist()) if nv else ""
            if has_scorer(sources[i]):
                score, info = compute_score_with_info(sources[i], text, gts[i])
            else:
                score, info = 0.0, {}
            infos["score"].append(score)
            infos["pred"].append(info.get("pred", text.strip()[-40:]))
        per_src = process_validation_metrics(sources, sample_inputs, infos)
        out = flatten_validation_metrics(per_src)
        out["val/test_score/mean"] = float(np.mean(infos["score"]))
        return out

    def fit(self, logger: Optional[Tracking] = None):
        cfg = self.config
        logger = logger or Tracking(
            cfg.trainer.project_name, cfg.trainer.experiment_name, cfg.trainer.logger
        )
        rng = jax.random.key(self._seed + 7)
        test_freq = cfg.trainer.get("test_freq", -1)
        self.global_steps = 1
        while self.global_steps <= cfg.trainer.total_training_steps:
            batch = self.dataset.sample_batch(cfg.data.train_batch_size)
            rng, sub = jax.random.split(rng)
            metrics = self.training_step(batch, sub)
            if test_freq > 0 and self.global_steps % test_freq == 0:
                rng, vrng = jax.random.split(rng)
                metrics.update(self.validate(vrng))
            logger.log(metrics, self.global_steps)
            self.global_steps += 1
        logger.finish()
