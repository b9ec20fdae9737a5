#!/usr/bin/env bash
# PRIME recipe (reference: train/verl/recipe/prime): RLOO-style baseline with
# an implicit process reward model; here the sequence RM provides scores
# (models/reward_model.py) layered on rule rewards.
python3 -m vla_rft_tpu.trainer.main_ppo \
    algorithm.adv_estimator=rloo \
    actor_rollout_ref.actor.use_kl_loss=True \
    actor_rollout_ref.actor.kl_loss_type=low_var_kl "$@"
