"""LIBERO environment glue, driven against a recorded-API fixture.

LIBERO itself is not installable here (zero egress), so a stub package
mimicking its import surface (libero.libero.benchmark + envs.
OffScreenRenderEnv, the API used by run_libero_eval.py:281-366 /
libero_utils.get_libero_env) is injected into sys.modules and the REAL glue
— make_libero_env, prepare_observation's flip, run_episode's double reset +
set_init_state, run_suite_eval — is exercised end-to-end."""
import sys
import types

import numpy as np
import pytest

from vla_rft_tpu.eval.libero_eval import (
    GenerateConfig,
    make_libero_env,
    prepare_observation,
    resize_image_for_policy,
    run_episode,
    run_suite_eval,
)


class _FakeEnv:
    """Mimics OffScreenRenderEnv: renders upside-down frames, succeeds when
    the cumulative commanded |action| crosses a threshold."""

    def __init__(self, bddl_file_name=None, camera_heights=256, camera_widths=256):
        self.res = (camera_heights, camera_widths)
        self.bddl = bddl_file_name
        self.t = 0
        self.reset_calls = 0
        self.init_state = None
        self.actions = []

    def _obs(self):
        img = np.zeros((*self.res, 3), np.uint8)
        # marker: top-left BEFORE the render flip = bottom-right AFTER
        img[-1, -1] = 255
        return {
            "agentview_image": img,
            "robot0_eef_pos": np.array([0.1, 0.2, 0.3]),
            "robot0_eef_quat": np.array([0.0, 0.0, np.sin(0.5), np.cos(0.5)]),
            "robot0_gripper_qpos": np.array([0.02, -0.02]),
        }

    def reset(self):
        self.reset_calls += 1
        self.t = 0
        return self._obs()

    def set_init_state(self, state):
        self.init_state = np.asarray(state)
        return self._obs()

    def step(self, action):
        assert isinstance(action, list) and len(action) == 7
        self.actions.append(action)
        self.t += 1
        done = self.t >= 25
        return self._obs(), float(done), done, {}


@pytest.fixture()
def fake_libero(monkeypatch):
    class _Task:
        language = "pick up the bowl"

    class _Suite:
        n_tasks = 2

        def get_task(self, task_id):
            return _Task()

        def get_task_bddl_file_path(self, task_id):
            return f"/fake/task_{task_id}.bddl"

        def get_task_init_states(self, task_id):
            return [np.full(8, task_id, np.float32), np.full(8, task_id + 10, np.float32)]

    benchmark = types.ModuleType("libero.libero.benchmark")
    benchmark.get_benchmark_dict = lambda: {"libero_spatial": _Suite}
    envs = types.ModuleType("libero.libero.envs")
    envs.OffScreenRenderEnv = _FakeEnv
    libero_pkg = types.ModuleType("libero")
    libero_libero = types.ModuleType("libero.libero")
    libero_libero.benchmark = benchmark
    libero_pkg.libero = libero_libero
    for name, mod in [
        ("libero", libero_pkg),
        ("libero.libero", libero_libero),
        ("libero.libero.benchmark", benchmark),
        ("libero.libero.envs", envs),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return envs


def test_make_libero_env_constructs(fake_libero):
    env, lang, init_states = make_libero_env("libero_spatial", 1, resolution=64)
    assert isinstance(env, _FakeEnv)
    assert env.res == (64, 64)
    assert env.bddl == "/fake/task_1.bddl"
    assert lang == "pick up the bowl"
    assert len(init_states) == 2 and init_states[0][0] == 1


def test_prepare_observation_flip_and_proprio(fake_libero):
    env, _, _ = make_libero_env("libero_spatial", 0, resolution=64)
    obs = env.reset()
    prep = prepare_observation(obs, 64)
    # the render flip moves the env's [-1,-1] marker to [0,0] (both axes)
    assert prep["full_image"][0, 0].max() > 200
    assert prep["full_image"][-1, -1].max() < 60
    assert prep["proprio"].shape == (8,)
    np.testing.assert_allclose(prep["proprio"][:3], [0.1, 0.2, 0.3])
    # axis-angle magnitude = 2*acos(w) for the unit quat above
    np.testing.assert_allclose(np.linalg.norm(prep["proprio"][3:6]), 1.0, atol=1e-6)


def test_run_episode_and_suite(fake_libero, tmp_path):
    cfg = GenerateConfig(
        task_suite_name="libero_spatial",
        num_trials_per_task=2,
        num_steps_wait=3,
        num_open_loop_steps=4,
        resize_size=32,
        save_video_dir=str(tmp_path / "vids"),
    )
    calls = []

    def chunk_fn(observation):
        assert observation["full_image"].shape == (32, 32, 3)
        calls.append(1)
        return np.tile(np.linspace(-1, 1, 7), (cfg.num_open_loop_steps, 1))

    def env_factory(task_id):
        return make_libero_env("libero_spatial", task_id, resolution=48)

    metrics = run_suite_eval(cfg, chunk_fn, env_factory, num_tasks=2)
    assert metrics["success_rate"] == 1.0  # fake env succeeds at t=25 < budget
    assert metrics["task_0/success"] == 1.0 and metrics["task_1/success"] == 1.0
    assert calls, "policy was never queried"
    gifs = list((tmp_path / "vids").glob("*.gif"))
    assert gifs, "no rollout videos saved"
    assert any("success=True" in g.name for g in gifs)


def test_run_episode_set_init_state(fake_libero):
    env, _, init_states = make_libero_env("libero_spatial", 0, resolution=48)
    cfg = GenerateConfig(num_steps_wait=2, num_open_loop_steps=2, resize_size=32)
    ok = run_episode(
        env,
        lambda o: np.zeros((2, 7)),
        cfg,
        max_steps=40,
        initial_state=init_states[1],
    )
    assert ok
    # reference resets, then sets the recorded init state (:160-164)
    assert env.reset_calls >= 1
    np.testing.assert_allclose(env.init_state, init_states[1])
    # settle phase sent the gripper-open no-op
    assert env.actions[0][-1] == -1


def test_resize_is_antialiased():
    img = np.zeros((64, 64, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    small = resize_image_for_policy(img, 32)
    frac_pure = np.mean((small == 0) | (small == 255))
    assert frac_pure < 0.5, "eval resize looks nearest-neighbor"
