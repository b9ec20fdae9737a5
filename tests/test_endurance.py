"""tools/endurance.py smoke: kill+resume audit on the tiny preset (CPU).

The production artifact this guards is the reference's 400-step run with
checkpoint cadence (run_vla_rft.sh:6, ray_trainer.py:1762-1769): train N
steps, SIGKILL mid-run, auto-resume from the latest orbax checkpoint, and
prove the metric stream is complete + finite and the resume overlap is
bit-reproducible (fit() folds the rng by global step).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_endurance_kill_resume_smoke(tmp_path):
    wd = tmp_path / "endur"
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "endurance.py"),
            "--steps", "5", "--kill-at", "3", "--save-freq", "2",
            "--preset", "tiny", "--cpu", "--workdir", str(wd),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=1500,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    with open(wd / "ENDURANCE.json") as f:
        audit = json.load(f)
    assert audit["ok"], audit
    assert audit["steps_logged"] == 5
    assert audit["missing_steps"] == []
    assert audit["killed_at_step"] >= 3
    assert audit["nan_skip_events"] == 0
    # steps between the last checkpoint (save_freq=2 -> step 2) and the kill
    # are re-run after resume; the folded-rng path makes them reproducible
    assert audit["resume_overlap_steps"], audit
    assert audit["resume_reward_max_abs_dev"] is not None
    assert audit["resume_reward_max_abs_dev"] <= 1e-6, audit
