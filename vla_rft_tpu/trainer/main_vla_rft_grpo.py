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

    dataset = val_dataset = None
    ds_path = config.data.video.dataset_path
    if ds_path:
        from vla_rft_tpu.data.rlds import RLDSConfig, RLDSDataset

        tokenizer = _load_tokenizer(config)
        val_fraction = float(config.data.get("val_fraction", 0.0) or 0.0)
        ds_cfg = dict(
            data_dir=ds_path,
            dataset_name=config.data.video.dataset_name,
            shuffle_buffer_size=config.data.shuffle_buffer_size,
            val_fraction=val_fraction,
        )
        dataset = RLDSDataset(
            RLDSConfig(**ds_cfg, split="train"),
            tokenizer,
            batch_size=config.data.train_batch_size,
            image_aug=bool(config.data.get("image_aug", False)),
        )
        if val_fraction > 0:
            val_dataset = RLDSDataset(
                RLDSConfig(**ds_cfg, split="val"),
                tokenizer,
                batch_size=config.data.train_batch_size,
                stats=dataset.stats,  # normalization must match training
            )

    trainer = VLARFTGRPOTrainer(
        config, preset=preset, dataset=dataset, val_dataset=val_dataset
    )
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

    # visual tokenizer (reference TokenizerWorker.init_model loads
    # TOKENIZER[name].from_pretrained(config.tokenizer.path),
    # fsdp_workers.py:1723): a diffusers-style dir (config.json +
    # *.safetensors/*.bin) or a single torch .pt/.pth/.ckpt file.
    tok_path = config.processor.tokenizer.path
    if tok_path:
        sd = _load_state_dicts(tok_path)
        kw = {}
        mcfg = _read_model_config(tok_path)
        if "block_out_channels" in mcfg:
            kw["n_blocks"] = len(mcfg["block_out_channels"])
        if "layers_per_block" in mcfg:
            kw["layers_per_block"] = int(mcfg["layers_per_block"])
        trainer.params["tokenizer"] = jax.device_put(
            cw.convert_compressive_vq(sd, **kw)
        )

    # LPIPS (reference LPIPS() pulls torchvision VGG16 features + the
    # taming vgg.pth lin heads, ivideogpt/lpips.py:44-61).  lpips_path is a
    # file or dir whose merged state dict holds `features.N.*` (torchvision)
    # or `net.sliceK.N.*` (taming) conv weights plus `lin{i}.model.1.weight`
    # heads; lin heads are optional (identity-free VGG distance otherwise).
    lpips_path = config.processor.get("lpips_path", None)
    if lpips_path:
        sd = _load_state_dicts(lpips_path)
        vgg_sd, lin_sd = _split_lpips_sd(sd)
        if not vgg_sd:
            raise ValueError(
                f"no VGG16 feature weights (features.N.* / net.sliceK.N.*) in {lpips_path}"
            )
        converted = cw.convert_lpips(vgg_sd, lin_sd or None)
        if not lin_sd:  # keep randomly initialized lin heads
            for i in range(5):
                converted["params"][f"lin{i}"] = trainer.params["lpips"]["params"][f"lin{i}"]
        trainer.params["lpips"] = jax.device_put(converted)


def _load_state_dicts(path):
    """Merge every weight file at `path` (file or directory) into one
    torch-layout state dict: *.safetensors via safetensors.numpy, the rest
    (.pt/.pth/.bin/.ckpt) via torch.load."""
    import glob
    import os

    from tools import convert_weights as cw

    if os.path.isdir(path):
        files = sorted(
            f
            for pat in ("*.safetensors", "*.bin", "*.pt", "*.pth", "*.ckpt")
            for f in glob.glob(os.path.join(path, pat))
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no weight files under {path}")
    sd = {}
    for f in files:
        if f.endswith(".safetensors"):
            import safetensors.numpy as stn

            sd.update(stn.load_file(f))
        else:
            sd.update(cw.load_torch_state_dict(f))
    return sd


def _read_model_config(path):
    import json
    import os

    cfg_file = os.path.join(path, "config.json") if os.path.isdir(path) else None
    if cfg_file and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            return json.load(f)
    return {}


def _split_lpips_sd(sd):
    """Partition an LPIPS state dict into torchvision-layout VGG conv weights
    and lin heads.  Taming's vgg16 wrapper keeps the ORIGINAL features index
    as the module name inside each slice (`net.slice2.5.weight` == torchvision
    `features.5.weight`), so slices translate by dropping the slice prefix."""
    import re

    vgg_sd, lin_sd = {}, {}
    for k, v in sd.items():
        m = re.fullmatch(r"(?:net\.)?slice\d+\.(\d+)\.(weight|bias)", k)
        if m:
            vgg_sd[f"features.{m.group(1)}.{m.group(2)}"] = v
        elif k.startswith("features."):
            vgg_sd[k] = v
        elif re.match(r"lin\d+\.", k):
            lin_sd[k] = v
    return vgg_sd, lin_sd


if __name__ == "__main__":
    run()
