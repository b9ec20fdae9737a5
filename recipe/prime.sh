#!/usr/bin/env bash
# PRIME recipe (reference: train/verl/recipe/prime/run_prime_qwen.sh):
# implicit process reward model — an LM-head RM initialized from the policy,
# scored as log p_rm - log p_ref per response token, trained online with the
# CE-DPO loss against verifier correctness, and RLOO advantages over
# process + outcome rewards (workers/prime_rm.py, trainer/prime_core.py).
python3 -m vla_rft_tpu.trainer.main_ppo \
    algorithm.adv_estimator=prime \
    algorithm.reward_gt_coef=5.0 \
    algorithm.reward_dpo_coef=5.0 \
    reward_model.enable=True \
    reward_model.rm_type=prime \
    reward_model.prime_granularity=token \
    reward_model.loss_type=ce \
    reward_model.beta_train=0.05 \
    reward_model.lr=1e-6 \
    actor_rollout_ref.actor.use_kl_loss=False "$@"
