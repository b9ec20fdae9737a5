#!/usr/bin/env bash
# DAPO recipe (reference: train/verl/recipe/dapo): clip-higher + token-level
# loss aggregation + no KL, GRPO-style groups. Maps to first-class config.
python3 -m vla_rft_tpu.trainer.main_ppo \
    algorithm.adv_estimator=grpo \
    actor_rollout_ref.actor.clip_ratio_low=0.2 \
    actor_rollout_ref.actor.clip_ratio_high=0.28 \
    actor_rollout_ref.actor.loss_agg_mode=token-mean \
    actor_rollout_ref.actor.use_kl_loss=False \
    algorithm.use_kl_in_reward=False "$@"
