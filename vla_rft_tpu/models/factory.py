"""Model factory: build the full VLA-RFT model bundle from a Config.

Presets:
* 'libero' — the real run shapes: OpenVLA (SigLIP-so400m + DINOv2-L +
  Qwen2.5-0.5B), action expert (DiT d8/h512), WM LLaMA 24L/1024h vocab 9008,
  CompressiveVQModelFSQ at 256px, VGG16 LPIPS.
* 'tiny' — same topology at test sizes (CPU-friendly).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig
from vla_rft_tpu.models.lpips import LPIPS
from vla_rft_tpu.models.prismatic import OpenVLA, OpenVLAConfig
from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.models.vit import ViTConfig
from vla_rft_tpu.workers.processor import ProcessorConfig
from vla_rft_tpu.workers.reward import RewardConfig
from vla_rft_tpu.workers.wm_rollout import WMRolloutConfig


@dataclasses.dataclass
class ModelBundle:
    vla: OpenVLA
    expert: ActionExpert
    wm: Decoder
    tokenizer: CompressiveVQModelFSQ
    lpips: LPIPS
    vla_cfg: OpenVLAConfig
    expert_cfg: ActionHeadConfig
    wm_cfg: TransformerConfig
    proc_cfg: ProcessorConfig
    wm_roll_cfg: WMRolloutConfig
    reward_cfg: RewardConfig
    # data shapes
    policy_seq_len: int = 96
    policy_image_size: int = 224
    wm_image_size: int = 256
    num_raw_frames: int = 9  # data.video.segment_length


def _checked_block_b(config) -> int:
    """decode_block_b is an upper bound on the kernel's batch block; each
    generate_sequences call clamps it to the largest divisor of the caller's
    uniform-prefix run (prefix_run), so a block can never span two samples'
    shared prompt caches regardless of this value."""
    return max(1, int(config.world_model_rollout.rollout.get("decode_block_b", 32) or 1))


def _wm_size_overrides(config, wm_cfg: TransformerConfig) -> TransformerConfig:
    """Apply world_model_rollout.model.size_overrides (non-None fields only)
    on top of the preset's WM architecture — capacity sweeps without a new
    preset (tools/rft_evidence.py --wm-hidden/...)."""
    ov = config.world_model_rollout.model.get("size_overrides", None)
    if ov is None:
        return wm_cfg
    kw = {k: int(v) for k, v in ov.to_dict().items() if v is not None}
    return dataclasses.replace(wm_cfg, **kw) if kw else wm_cfg


def build_models(config, preset: str = "libero") -> ModelBundle:
    proc = config.processor
    roll = config.world_model_rollout.rollout
    trainer = config.trainer

    proc_cfg = ProcessorConfig(
        visual_token_num=proc.visual_token_num,
        action_bins=proc.action_bins,
        action_dim=proc.action_dim,
        tokens_per_frame=proc.tokens_per_frame,
        bos_token_id=proc.bos_token_id,
        eos_token_id=proc.eos_token_id,
        pad_token_id=proc.pad_token_id,
        processor_type=proc.processor_type,
    )
    segment_length = config.data.video.segment_length
    wm_roll_cfg = WMRolloutConfig(
        prompt_length=config.data.max_prompt_length,
        response_length=config.data.max_response_length,
        num_frames=segment_length - 1,
        interact_max_tokens=roll.interact_max_tokens,
        action_dim=proc.action_dim,
        temperature=roll.val_kwargs.temperature if roll.is_validate else roll.temperature,
        top_k=roll.val_kwargs.top_k if roll.is_validate else roll.top_k,
        top_p=roll.val_kwargs.top_p if roll.is_validate else roll.top_p,
        do_sample=roll.do_sample,
        cache_segments=roll.get("cache_segments", 4),
        speculative_k=int(roll.get("speculative_k", 0) or 0),
    )
    loss_w = trainer.loss_weight
    reward_cfg = RewardConfig(
        reward_fn=trainer.reward_fn,
        lpips_weight=loss_w.lpips,
        recon_weight=loss_w.get(trainer.reward_fn, 1.0),
        msp_reward_aggregate=trainer.msp_reward_aggregate,
        msp_reward_discount=trainer.msp_reward_discount,
        num_frames=segment_length - 1,
    )

    num_images = int(config.actor_rollout_ref.model.get("num_images_in_input", 1))

    if preset == "tiny":
        vla_cfg = OpenVLAConfig.tiny_test()
        if num_images != 1:
            vla_cfg = dataclasses.replace(vla_cfg, num_images=num_images)
        expert_cfg = ActionHeadConfig(
            llm_dim=vla_cfg.llm.hidden_size, dit_hidden=32, dit_depth=2, dit_heads=4,
            action_dim=proc.action_dim, dtype=jnp.float32,
            # invariant: the action chunk length equals the number of
            # predicted future frames (LIBERO: 8 = segment_length 9 - 1)
            num_actions_chunk=segment_length - 1,
        )
        wm_cfg = TransformerConfig(
            vocab_size=config.actor_rollout_ref.actor.vocab_size,
            hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
            num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
        )
        wm_cfg = _wm_size_overrides(config, wm_cfg)
        tokenizer = CompressiveVQModelFSQ(
            block_out_channels=(8, 16, 16), layers_per_block=1, latent_channels=4,
            norm_num_groups=4, resolution=32, ctx_res=(8, 8), dyn_res=(2, 2),
            max_att_resolution=8,
        )
        lpips = LPIPS()
        return ModelBundle(
            vla=OpenVLA(vla_cfg),
            expert=ActionExpert(expert_cfg),
            wm=Decoder(wm_cfg),
            tokenizer=tokenizer,
            lpips=lpips,
            vla_cfg=vla_cfg,
            expert_cfg=expert_cfg,
            wm_cfg=wm_cfg,
            proc_cfg=proc_cfg,
            wm_roll_cfg=wm_roll_cfg,
            reward_cfg=reward_cfg,
            policy_seq_len=32,
            policy_image_size=vla_cfg.siglip.image_size,
            wm_image_size=32,
            num_raw_frames=segment_length,
        )

    if preset == "push":
        # small-but-capable sizes for the MuJoCo push-env RFT-evidence run
        # (tools/rft_evidence.py): 64px policy views (8x8 ViT patches), a
        # 128-hidden policy LLM, a 4-layer WM, and a 32px tokenizer with
        # 16 dyn tokens/frame — the same topology as 'libero', sized so a
        # full tokenizer->WM->BC->RFT pipeline trains in-harness.  Fills the
        # role of the reference's arithmetic-sequence fake backend
        # (train/verl/tests/e2e/arithmetic_sequence/) but with REAL physics.
        vla_cfg = OpenVLAConfig(
            siglip=ViTConfig.siglip_so400m(
                image_size=64, patch_size=8, hidden_size=64, depth=3,
                num_heads=4, mlp_dim=128, dtype=jnp.float32,
                param_dtype=jnp.float32,
            ),
            dino=ViTConfig.dinov2_large_reg4(
                image_size=64, patch_size=8, hidden_size=64, depth=3,
                num_heads=4, mlp_dim=128, dtype=jnp.float32,
                param_dtype=jnp.float32,
            ),
            llm=TransformerConfig(
                vocab_size=152000, hidden_size=128, intermediate_size=256,
                num_layers=3, num_heads=4, num_kv_heads=2, qkv_bias=True,
                tie_word_embeddings=True, dtype=jnp.float32,
                param_dtype=jnp.float32, attn_impl="xla",
            ),
            num_patches=64,
            num_tokens=8,
            num_images=num_images,
        )
        expert_cfg = ActionHeadConfig(
            llm_dim=vla_cfg.llm.hidden_size, dit_hidden=64, dit_depth=3,
            dit_heads=4, action_dim=proc.action_dim, dtype=jnp.float32,
            num_actions_chunk=segment_length - 1,
            num_flow_steps=config.actor_rollout_ref.rollout.get("num_flow_steps", 10),
        )
        wm_cfg = TransformerConfig(
            vocab_size=config.actor_rollout_ref.actor.vocab_size,
            hidden_size=128, intermediate_size=512, num_layers=4, num_heads=2,
            num_kv_heads=2, dtype=jnp.float32, param_dtype=jnp.float32,
            attn_impl="xla",
        )
        wm_cfg = _wm_size_overrides(config, wm_cfg)
        tokenizer = CompressiveVQModelFSQ(
            block_out_channels=(16, 32, 32), layers_per_block=1,
            latent_channels=4, norm_num_groups=4, resolution=32,
            ctx_res=(8, 8), dyn_res=(4, 4), patch_size=2,
            max_att_resolution=8,
        )
        lpips = LPIPS()
        return ModelBundle(
            vla=OpenVLA(vla_cfg),
            expert=ActionExpert(expert_cfg),
            wm=Decoder(wm_cfg),
            tokenizer=tokenizer,
            lpips=lpips,
            vla_cfg=vla_cfg,
            expert_cfg=expert_cfg,
            wm_cfg=wm_cfg,
            proc_cfg=proc_cfg,
            wm_roll_cfg=wm_roll_cfg,
            reward_cfg=reward_cfg,
            policy_seq_len=32,
            policy_image_size=64,
            wm_image_size=32,
            num_raw_frames=segment_length,
        )

    # ----- libero (real) sizes -----
    vla_cfg = OpenVLAConfig(num_images=num_images)
    expert_cfg = ActionHeadConfig(
        llm_dim=vla_cfg.llm.hidden_size,
        action_dim=proc.action_dim,
        num_flow_steps=config.actor_rollout_ref.rollout.get("num_flow_steps", 10),
    )
    wm_cfg = TransformerConfig.wm_llama(
        vocab_size=config.world_model_rollout.world_model.vocab_size,
        # int8 KV cache + int8-MXU decode scores (scale folding, see
        # ops/decode_attention.py): 1.5x faster per step than bf16 AND the
        # halved cache lets both rollout branches run at 32 seqs/call —
        # 2.4x WM rollout throughput. Rollout-only approximation; logprob
        # paths use full forwards, so PPO math is exact.
        kv_cache_dtype="int8",
        # rows per decode-kernel iteration (clamped per call by prefix_run;
        # see TransformerConfig.decode_block_b)
        decode_block_b=_checked_block_b(config),
        kv_layout=str(
            config.world_model_rollout.rollout.get("kv_layout", "hd") or "hd"
        ),
    )
    wm_cfg = _wm_size_overrides(config, wm_cfg)
    # bf16 compute matches the reference's autocast (fsdp_workers.py:1732,
    # processor batch_forward autocast) and halves reward-stage time
    tokenizer = CompressiveVQModelFSQ(dtype=jnp.bfloat16)
    lpips = LPIPS(dtype=jnp.bfloat16)
    return ModelBundle(
        vla=OpenVLA(vla_cfg),
        expert=ActionExpert(expert_cfg),
        wm=Decoder(wm_cfg),
        tokenizer=tokenizer,
        lpips=lpips,
        vla_cfg=vla_cfg,
        expert_cfg=expert_cfg,
        wm_cfg=wm_cfg,
        proc_cfg=proc_cfg,
        wm_roll_cfg=wm_roll_cfg,
        reward_cfg=reward_cfg,
        policy_seq_len=96,
        policy_image_size=224,
        wm_image_size=256,
        num_raw_frames=segment_length,
    )


def init_params(bundle: ModelBundle, rng: jax.Array) -> Dict[str, Any]:
    """Random-init every param tree with the right shapes (checkpoint loading
    replaces these via tools/convert_weights.py when paths are configured).

    Runs on CPU: compiling the full-model init programs on TPU costs ~10
    minutes of remote compile for zero benefit; the trainer shards the
    resulting trees onto the mesh afterwards."""
    from vla_rft_tpu.ops.attention import force_impl

    cpus = jax.devices("cpu")
    if cpus:
        with jax.default_device(cpus[0]), force_impl("xla"):
            return _init_params_impl(bundle, rng)
    return _init_params_impl(bundle, rng)


def fast_random_params(bundle: ModelBundle, seed: int = 0) -> Dict[str, Any]:
    """Shape-only init: jax.eval_shape traces the init (zero FLOPs), leaves
    are materialized with numpy RNG (normal(0, 0.02) for weights, zeros for
    vectors).  Exact flax init distributions don't matter here — real weights
    come from tools/convert_weights.py; this exists so building the full-size
    bundle takes seconds, not the minutes a real init forward costs."""
    from vla_rft_tpu.ops.attention import force_impl

    with force_impl("xla"):
        shapes = jax.eval_shape(lambda r: _init_params_impl(bundle, r), jax.random.key(0))

    rng = np.random.default_rng(seed)

    def materialize(path, sd):
        shape = tuple(sd.shape)
        dtype = sd.dtype
        name = str(getattr(path[-1], "key", path[-1])).lower()
        # norm scales / layerscale gammas must be ~1 to keep signal alive
        # (flax names: Dense='kernel', Embed='embedding', norms='weight'/'scale')
        if name in ("weight", "scale") or "gamma" in name:
            return jnp.ones(shape, dtype)
        if name == "bias":
            return jnp.zeros(shape, dtype)
        arr = rng.standard_normal(size=shape, dtype=np.float32) * np.float32(0.02)
        return jnp.asarray(arr, dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def fast_random_params_device(bundle: ModelBundle, seed: int = 0) -> Dict[str, Any]:
    """fast_random_params, generated ON DEVICE inside one jitted program.

    The host variant materializes ~3.5GB of leaves with numpy and ships them
    through `jax.device_put` — at the axon tunnel's ~14MB/s that is minutes
    of pure upload per process start (measured round 4; the dominant cost of
    a warm-cache `python bench.py`).  Generating the leaves with on-device
    PRNG uploads nothing: one compile (persisted by the compilation cache),
    one dispatch.  Same leaf conventions as fast_random_params (ones for
    norm scales, zeros for biases, 0.02-normal weights)."""
    from vla_rft_tpu.ops.attention import force_impl

    with force_impl("xla"):
        shapes = jax.eval_shape(
            lambda r: _init_params_impl(bundle, r), jax.random.key(0)
        )
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def _kind(path) -> str:
        name = str(getattr(path[-1], "key", path[-1])).lower()
        if name in ("weight", "scale") or "gamma" in name:
            return "ones"
        if name == "bias":
            return "zeros"
        return "normal"

    kinds = [_kind(p) for p, _ in paths_leaves]

    @jax.jit
    def _gen(key):
        outs = []
        for i, (_, sd) in enumerate(paths_leaves):
            if kinds[i] == "ones":
                outs.append(jnp.ones(sd.shape, sd.dtype))
            elif kinds[i] == "zeros":
                outs.append(jnp.zeros(sd.shape, sd.dtype))
            else:
                r = jax.random.normal(
                    jax.random.fold_in(key, i), sd.shape, jnp.float32
                )
                outs.append((r * jnp.float32(0.02)).astype(sd.dtype))
        return outs

    leaves = _gen(jax.random.key(seed))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _init_params_impl(bundle: ModelBundle, rng: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(rng, 5)
    B = 1
    S = bundle.policy_seq_len
    img = bundle.policy_image_size
    vcfg = bundle.vla_cfg

    from vla_rft_tpu.models.action_masks import ACTION_TOKEN_BEGIN_IDX

    labels = np.full((B, S), -100, np.int64)
    labels[:, 3 : 3 + vcfg.num_tokens] = ACTION_TOKEN_BEGIN_IDX + 1
    dummy = {
        "input_ids": jnp.asarray(labels.clip(0), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "pixels": jnp.zeros((B, img, img, 6 * vcfg.num_images), jnp.float32),
    }
    vla_params = bundle.vla.init(
        ks[0], dummy["input_ids"], dummy["pixels"], dummy["labels"], dummy["attention_mask"]
    )
    hidden = jnp.zeros(
        (B, vcfg.total_patches + vcfg.num_tokens, vcfg.llm.hidden_size), jnp.float32
    )
    ecfg = bundle.expert_cfg
    expert_params = bundle.expert.init(
        ks[1],
        hidden,
        jnp.zeros((B, ecfg.num_actions_chunk, ecfg.action_dim)),
        jnp.zeros((B,)),
        jnp.zeros((B, vcfg.proprio_dim)),
    )
    wm_params = bundle.wm.init(ks[2], jnp.zeros((B, 8), jnp.int32))
    T = bundle.num_raw_frames + 1
    px = jnp.zeros((B, T, bundle.wm_image_size, bundle.wm_image_size, 3), jnp.float32)
    tok_params = bundle.tokenizer.init(ks[3], px)
    im = jnp.zeros((B, bundle.wm_image_size, bundle.wm_image_size, 3), jnp.float32)
    lpips_params = bundle.lpips.init(ks[4], im, im)
    return {
        "vla": vla_params,
        "expert": expert_params,
        "wm": wm_params,
        "tokenizer": tok_params,
        "lpips": lpips_params,
    }
