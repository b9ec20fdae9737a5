"""Benchmark: one full VLA-RFT training step at real LIBERO shapes on the
local TPU chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric: RFT frames/sec/chip — predicted world-model frames per second
of end-to-end RFT step time (rollout + logp + tokenize + WM decode + reward +
GRPO + PPO update), normalized per chip.  This is the BASELINE.json north
star ("rollout frames/sec/chip + RFT step time").

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
estimate the A100 reference at 17 frames/s/chip from its run shape — 4xA100,
256 seqs x 8 frames/step, vLLM 0.6.3 interact mode that re-prefills the whole
prompt every frame (vllm_rollout.py:231-242; ~1.2s/frame/GPU decode+prefill
plus policy rollout/update overhead → ~30s/step). vs_baseline uses that
documented estimate; judge against BENCH_r*.json over rounds for trend.
"""
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_FRAMES_PER_SEC_PER_CHIP = 17.0


def _mark(phases, name, t0):
    """Timeline instrumentation on stderr (the JSON line on stdout stays
    clean): the tunnel makes STARTUP, not compute, the budget risk — record
    where the wall time goes so a timed-out run is still diagnosable."""
    now = time.time()
    phases[name] = round(now - t0, 1)
    print(f"[bench +{now - phases['_start']:.0f}s] {name}", file=sys.stderr, flush=True)
    return now


def main():
    phases = {"_start": time.time()}
    t0 = phases["_start"]
    import jax

    from vla_rft_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if os.environ.get("BENCH_IM2COL"):
        # parity-tested conv->GEMM lowering (utils/conv_im2col.py): unblocks
        # reward-stage sweeps whose fresh conv HLOs compile pathologically
        # slowly through the remote tunnel (270s per 3x3 conv, DESIGN_NOTES)
        from vla_rft_tpu.utils.conv_im2col import enable_im2col_conv

        enable_im2col_conv()
    import jax.numpy as jnp

    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
    from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer

    t0 = _mark(phases, "imports_s", t0)

    n_devices = len(jax.devices())
    c = vla_rft_default_config()
    # per-chip slice of the reference run: 4 GPUs x (bs 16 x n 16) = 64 seqs/GPU.
    # One v5e chip: B=4 unique x n=16 = 64 sequences — the split-cache decode
    # freed ~4GB of KV-cache HBM, so a v5e now matches the reference's
    # per-GPU sequence count (BENCH_TB overrides; 2 was the pre-split value).
    c.data.train_batch_size = int(os.environ.get("BENCH_TB", 4)) * n_devices
    c.actor_rollout_ref.rollout.n = 16
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 16
    # expert-only grads are tiny: 16/chip halves the update stage's fixed
    # costs vs the reference's 8/GPU (a per-device perf knob, not semantics)
    c.actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu = 16
    if os.environ.get("BENCH_RSC"):
        c.actor_rollout_ref.actor.replay_step_chunks = int(os.environ["BENCH_RSC"])
    if os.environ.get("BENCH_RWMB"):  # reward/detokenize rows per chunk
        c.processor.tokenizer_micro_batch_size = int(os.environ["BENCH_RWMB"])
    if os.environ.get("BENCH_WMMB"):  # wm decode rows per call
        c.world_model_rollout.rollout.micro_batch_size = int(os.environ["BENCH_WMMB"])
    c.actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu = 16
    c.trainer.total_training_steps = 400
    c.trainer.logger = []
    c.mesh = {"dp": n_devices, "fsdp": 1, "tp": 1, "sp": 1}

    mesh = make_mesh(MeshConfig(dp=n_devices))
    # params generated ON DEVICE: the host-init path device_puts ~3.5GB
    # through the ~14MB/s tunnel (minutes of upload per process start)
    from vla_rft_tpu.models.factory import build_models, fast_random_params_device

    params = fast_random_params_device(build_models(c, "libero"), seed=0)
    t0 = _mark(phases, "params_on_device_s", t0)
    trainer = VLARFTGRPOTrainer(c, preset="libero", mesh=mesh, params=params)
    t0 = _mark(phases, "trainer_ctor_s", t0)

    # host-side data generation happens up front: a real run hides it behind
    # the PrefetchingLoader, so it doesn't belong in the timed window
    batches = [trainer.dataset.next_batch() for _ in range(4)]
    rng = jax.random.key(0)
    t0 = _mark(phases, "host_data_s", t0)

    # warmup / compile (prefetches the first timed batch like fit() does)
    t0 = time.time()
    trainer.training_step(batches[0], rng, next_batch_np=batches[1])
    compile_s = time.time() - t0
    t0 = _mark(phases, "warmup_s", t0)

    times = []
    metrics = {}
    for i in range(2):
        batch = trainer._prefetched_batch
        t0 = time.time()
        metrics = trainer.training_step(
            batch, jax.random.fold_in(rng, i), next_batch_np=batches[i + 2]
        )
        times.append(time.time() - t0)
    step_s = float(np.min(times))
    if os.environ.get("BENCH_PROFILE"):
        # BENCH_PROFILE=/tmp/trace_dir: capture one profiled step for
        # tensorboard/xprof stage-level attribution
        with jax.profiler.trace(os.environ["BENCH_PROFILE"]):
            trainer.training_step(
                trainer._prefetched_batch, jax.random.fold_in(rng, 9),
                next_batch_np=batches[0],
            )

    n_seqs = c.data.train_batch_size * c.actor_rollout_ref.rollout.n
    frames = n_seqs * 8
    fps_chip = frames / step_s / n_devices

    wm_t = float(metrics.get("timing_s/wm_rollout", 0.0))
    # the gt-action branch adds generated frames in the wm stage: one rollout
    # per row (reference behavior) or per unique sample (gt_branch_per_sample)
    wm_roll = trainer.config.world_model_rollout.rollout
    if not wm_roll.w_gt_ac:
        wm_frames = frames
    elif wm_roll.get("gt_branch_per_sample", True):
        wm_frames = frames + frames // c.actor_rollout_ref.rollout.n
    else:
        wm_frames = frames * 2
    out = {
        "metric": "rft_frames_per_sec_per_chip",
        "value": round(fps_chip, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_chip / A100_BASELINE_FRAMES_PER_SEC_PER_CHIP, 3),
        "extra": {
            "step_time_s": round(step_s, 2),
            "compile_time_s": round(compile_s, 1),
            # single-chip whole-step MFU (VERDICT r3 item 2): estimated
            # fwd+bwd FLOPs across every model family in the step
            # (utils/flops_counter.vla_rft_step_flops) / v5e bf16 peak
            "mfu": round(float(metrics.get("perf/mfu", 0.0)), 4),
            "startup_phases_s": {
                k: v for k, v in phases.items() if not k.startswith("_")
            },
            "sequences_per_step": n_seqs,
            "wm_rollout_frames_per_sec_per_chip": (
                round(wm_frames / wm_t / n_devices, 2) if wm_t > 0 else None
            ),
            "n_devices": n_devices,
            "timing_s": {
                k.split("/")[-1]: round(float(v), 2)
                for k, v in metrics.items()
                if k.startswith("timing_s/")
            },
            "baseline_note": "A100 estimate 17 frames/s/chip (see module docstring)",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
