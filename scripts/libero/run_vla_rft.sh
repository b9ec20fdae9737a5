#!/usr/bin/env bash
# TPU-native equivalent of train/verl/examples/grpo_trainer/run_vla_rft.sh
set -x
python3 -m vla_rft_tpu.trainer.main_vla_rft_grpo \
    trainer.total_training_steps=400 \
    trainer.save_freq=50 \
    trainer.use_ac_reward=False \
    trainer.reward_fn=mae \
    trainer.logger='["console","jsonl"]' \
    trainer.project_name=vla_rft \
    trainer.experiment_name=vla_rft_fm \
    trainer.save_last_freq=20 \
    trainer.save_last_num=2 \
    trainer.default_local_dir=checkpoints/libero/RFT/${LIBERO_TASK_NAME}/${DATE}_${POST_EXP_NAME} \
    trainer.msp_reward_aggregate=mean \
    trainer.loss_weight.mse=0 trainer.loss_weight.lpips=1 trainer.loss_weight.mae=1 \
    data.train_batch_size=16 \
    data.video.dataset_path=${DATASET_PATH:-} \
    data.video.dataset_name=libero_${LIBERO_TASK_NAME}_no_noops \
    algorithm.adv_estimator=grpo \
    actor_rollout_ref.actor.optim.lr=1e-6 \
    actor_rollout_ref.actor.optim.sigma_lr=1e-5 \
    actor_rollout_ref.actor.optim.lr_warmup_steps=10 \
    actor_rollout_ref.actor.ppo_mini_batch_size=16 \
    actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu=8 \
    actor_rollout_ref.actor.use_mse_loss=True \
    actor_rollout_ref.actor.mse_loss_coef=0.01 \
    actor_rollout_ref.actor.entropy_coeff=0.003 \
    actor_rollout_ref.rollout.n=16 \
    actor_rollout_ref.model.ckpt_path=${VLA_CKPT:-} \
    world_model_rollout.model.path=${WM_CKPT:-} \
    world_model_rollout.world_model.vocab_size=9008 \
    world_model_rollout.rollout.top_p=0.8 \
    processor.tokenizer.name=ctx_cnn \
    processor.tokenizer.path=${TOKENIZER_CKPT:-} \
    data.max_prompt_length=1095 data.max_response_length=568 \
    processor.bos_token_id=9006 processor.eos_token_id=9007 processor.pad_token_id=9007 \
    processor.tokens_per_frame=64 processor.processor_type=ctx_msp \
    processor.max_length=1663 processor.use_img_gt_ac=True "$@"
