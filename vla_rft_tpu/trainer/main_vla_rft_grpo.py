"""CLI entrypoint for VLA-RFT GRPO training.

Counterpart of train/verl/verl/trainer/main_vla_rft_grpo.py (:52-186): the
hydra main + Ray TaskRunner collapse into config resolution + one trainer.

Usage (hydra-style dotted overrides, run_vla_rft.sh parity):
  python -m vla_rft_tpu.trainer.main_vla_rft_grpo \
      trainer.total_training_steps=400 data.train_batch_size=16 \
      actor_rollout_ref.rollout.n=16 processor.tokenizer.name=ctx_cnn ...
"""
from __future__ import annotations

import sys

from vla_rft_tpu.config import vla_rft_default_config


def run(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    preset = "libero"
    if "--preset=tiny" in argv:
        preset = "tiny"
        argv.remove("--preset=tiny")
    config = vla_rft_default_config().apply_overrides([a for a in argv if "=" in a])

    from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer

    dataset = None
    ds_path = config.data.video.dataset_path
    if ds_path:
        from vla_rft_tpu.data.rlds import RLDSConfig, RLDSDataset

        tokenizer = _load_tokenizer(config)
        dataset = RLDSDataset(
            RLDSConfig(
                data_dir=ds_path,
                dataset_name=config.data.video.dataset_name,
                shuffle_buffer_size=config.data.shuffle_buffer_size,
            ),
            tokenizer,
            batch_size=config.data.train_batch_size,
        )

    trainer = VLARFTGRPOTrainer(config, preset=preset, dataset=dataset)
    _maybe_load_pretrained(trainer, config)
    trainer.fit()


def _load_tokenizer(config):
    ckpt = config.actor_rollout_ref.model.ckpt_path
    if ckpt:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(ckpt)
    raise ValueError("RLDS data requires actor_rollout_ref.model.ckpt_path (tokenizer)")


def _maybe_load_pretrained(trainer, config):
    """Load converted checkpoints when paths are configured
    (reference loads OpenVLA + component .pt files + WM + tokenizer)."""
    import jax

    from tools import convert_weights as cw

    ckpt = config.actor_rollout_ref.model.ckpt_path
    if ckpt:
        import safetensors.numpy as stn
        import glob
        import os

        sd = {}
        for f in glob.glob(os.path.join(ckpt, "*.safetensors")):
            sd.update(stn.load_file(f))
        if sd:
            trainer.params["vla"] = jax.device_put(
                cw.convert_openvla(sd, trainer.bundle.vla_cfg)
            )
        # component checkpoints (action_head--*.pt etc.)
        try:
            ah = cw.load_torch_state_dict(cw.find_checkpoint_file(ckpt, "action_head"))
            pp = cw.load_torch_state_dict(cw.find_checkpoint_file(ckpt, "proprio_projector"))
            na = cw.load_torch_state_dict(
                cw.find_checkpoint_file(ckpt, "noisy_action_projector")
            )
            try:
                sg = cw.load_torch_state_dict(cw.find_checkpoint_file(ckpt, "sigma_net"))
            except FileNotFoundError:
                sg = None
            expert = cw.convert_action_expert(ah, sg, pp, na, trainer.bundle.expert_cfg)
            if sg is None:  # keep randomly initialized sigma net
                expert["params"]["sigma_net"] = trainer.params["expert"]["params"]["sigma_net"]
            trainer.params["expert"] = jax.device_put(expert)
        except FileNotFoundError:
            pass
    wm_path = config.world_model_rollout.model.path
    if wm_path:
        import glob
        import os
        import safetensors.numpy as stn

        sd = {}
        for f in glob.glob(os.path.join(wm_path, "*.safetensors")):
            sd.update(stn.load_file(f))
        if sd:
            trainer.params["wm"] = jax.device_put(
                cw.convert_hf_decoder(sd, trainer.bundle.wm_cfg)
            )


if __name__ == "__main__":
    run()
