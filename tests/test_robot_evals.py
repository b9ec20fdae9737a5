"""ALOHA / BridgeV2 eval harnesses + the action server.

Fake envs implement exactly the robot-side protocols the harnesses consume
(dm_env TimeStep for ALOHA, WidowX service client for Bridge), so the full
episode loops run headless — same strategy as test_libero_glue's
ScriptedEnv.  Reference behaviors asserted: requery cadence, relative-action
integration against COMMANDED targets, obs preprocessing chains, the /act
wire protocol incl. the double-encoded fallback (deploy.py:81-84).
"""
import numpy as np
import pytest

from vla_rft_tpu.eval.aloha_eval import (
    AlohaGenerateConfig,
    prepare_observation,
    resize_image_for_preprocessing,
    run_episode as aloha_run_episode,
    run_eval as aloha_run_eval,
)
from vla_rft_tpu.eval.bridge_eval import (
    BridgeGenerateConfig,
    refresh_obs,
    run_episode as bridge_run_episode,
    run_eval as bridge_run_eval,
    save_rollout_data,
)
from vla_rft_tpu.eval.widowx_gym import WidowXGym, convert_obs, null_obs
from vla_rft_tpu.serving.action_server import (
    ActionServer,
    decode_payload,
    encode_payload,
    get_action_from_server,
)


# ---------------------------------------------------------------- ALOHA


class _TimeStep:
    def __init__(self, obs):
        self.observation = obs


class FakeAlohaEnv:
    """dm_env-shaped ALOHA rig: cam_high/cam_left_wrist/cam_right_wrist
    images + 14-dof qpos; succeeds once the cumulative commanded target
    passes a threshold (exercises relative-action integration)."""

    DOF = 14

    def __init__(self, succeed_at_qpos: float = 0.5):
        self.succeed_at_qpos = succeed_at_qpos
        self.qpos = np.zeros(self.DOF)
        self.commands = []
        self.done = False

    def _obs(self):
        img = np.full((480, 640, 3), 80, np.uint8)
        return _TimeStep(
            {
                "images": {
                    "cam_high": img,
                    "cam_left_wrist": img // 2,
                    "cam_right_wrist": img // 4,
                },
                "qpos": self.qpos.copy(),
            }
        )

    def reset(self):
        self.qpos = np.zeros(self.DOF)
        self.commands = []
        self.done = False
        return self._obs()

    def get_qpos(self):
        return self.qpos.copy()

    def get_observation(self, t=0):
        return self._obs()

    def step(self, action):
        action = np.asarray(action)
        self.commands.append(action)
        self.qpos = action  # position-controlled rig tracks the command
        if self.qpos[0] >= self.succeed_at_qpos:
            self.done = True
        return self._obs()

    def is_success(self):
        return self.done


def test_aloha_preprocess_two_stage():
    img = (np.arange(480 * 640 * 3) % 255).reshape(480, 640, 3).astype(np.uint8)
    pre = resize_image_for_preprocessing(img)
    assert pre.shape == (256, 256, 3) and pre.dtype == np.uint8
    obs, views = prepare_observation(_TimeStep(
        {"images": {"cam_high": img, "cam_left_wrist": img, "cam_right_wrist": img},
         "qpos": np.arange(14.0)}), resize_size=224)
    assert obs["full_image"].shape == (224, 224, 3)
    assert obs["left_wrist_image"].shape == (224, 224, 3)
    assert obs["state"].shape == (14,)
    assert len(views) == 3


def test_aloha_episode_requery_cadence_and_absolute_actions():
    env = FakeAlohaEnv(succeed_at_qpos=np.inf)
    calls = []

    def policy(obs, task):
        calls.append(obs["state"].copy())
        # constant small absolute command, chunk of 30 rows (only the first
        # num_open_loop_steps=5 must execute per query)
        return np.full((30, 14), 0.01, np.float32)

    cfg = AlohaGenerateConfig(num_open_loop_steps=5, max_steps=12, pace_control=False)
    stats, frames = aloha_run_episode(cfg, env, "fold the towel", policy)
    assert stats["total_steps"] == 12
    # 12 steps / 5-step chunks -> queries at t=0,5,10
    assert len(calls) == 3
    assert len(env.commands) == 12
    assert len(frames) == 12
    assert stats["success"] is False


def test_aloha_relative_actions_integrate_commanded_target():
    env = FakeAlohaEnv(succeed_at_qpos=0.049)

    def policy(obs, task):
        return np.full((25, 14), 0.01, np.float32)

    cfg = AlohaGenerateConfig(num_open_loop_steps=25, max_steps=40,
                              use_relative_actions=True, pace_control=False)
    stats, _ = aloha_run_episode(cfg, env, "t", policy)
    # targets integrate: 0.01, 0.02, ... success crosses 0.049 at step 5
    assert stats["success"] is True
    assert stats["total_steps"] == 5
    np.testing.assert_allclose(env.commands[4][0], 0.05, rtol=1e-5)


def test_aloha_run_eval_aggregates(tmp_path):
    env = FakeAlohaEnv(succeed_at_qpos=0.049)

    def policy(obs, task):
        return np.full((25, 14), 0.01 if task == "win" else 0.0, np.float32)

    cfg = AlohaGenerateConfig(num_open_loop_steps=25, max_steps=8,
                              use_relative_actions=True, pace_control=False,
                              save_video_dir=str(tmp_path))
    out = aloha_run_eval(cfg, policy, env, ["win", "lose"])
    assert out["num_episodes"] == 2
    assert out["num_successes"] == 1
    assert out["success_rate"] == 0.5
    assert len(list(tmp_path.glob("*.gif"))) == 2


# ---------------------------------------------------------------- Bridge


class FakeWidowXClient:
    """bridge_data_robot service protocol: flat CHW float image in [0,1],
    7-dim state, full_image passthrough; optional connection drop."""

    def __init__(self, im_size=256, drop_after=None):
        self.im_size = im_size
        self.actions = []
        self.drop_after = drop_after
        self.reset_calls = 0
        self.moves = []

    def reset(self):
        self.reset_calls += 1

    def move(self, transform, duration=0.8, blocking=True):
        assert blocking, "reset move must be blocking (widowx_env.py:150-155)"
        self.moves.append(np.asarray(transform))

    def step_action(self, action, blocking=False):
        self.actions.append(np.asarray(action))

    def get_observation(self):
        if self.drop_after is not None and len(self.actions) >= self.drop_after:
            return None
        return {
            "image": np.full((3 * self.im_size * self.im_size,), 0.5, np.float64),
            "state": np.arange(7.0),
            "full_image": np.full((480, 640, 3), 90, np.uint8),
        }


def test_widowx_convert_obs_proprio_padding():
    raw = FakeWidowXClient().get_observation()
    obs = convert_obs(raw, 256)
    assert obs["image_primary"].shape == (256, 256, 3)
    assert obs["image_primary"].dtype == np.uint8
    assert obs["image_primary"][0, 0, 0] == 127  # 0.5 * 255
    # [state[:6], 0, state[-1]] -> 8-dim RLDS layout
    np.testing.assert_allclose(obs["proprio"], [0, 1, 2, 3, 4, 5, 0, 6])


def test_widowx_gym_reset_step_and_drop():
    cfg = BridgeGenerateConfig()
    client = FakeWidowXClient(drop_after=2)
    env = WidowXGym(client, cfg, blocking=False)
    obs, info = env.reset()
    assert client.reset_calls == 1 and len(client.moves) == 1
    # start transform carries the configured XYZ in its last column
    np.testing.assert_allclose(client.moves[0][:3, 3], cfg.init_ee_pos)
    obs, r, done, truncated, _ = env.step(np.zeros(7))
    assert not truncated
    obs, r, done, truncated, _ = env.step(np.zeros(7))
    assert truncated and env.done
    np.testing.assert_array_equal(obs["image_primary"], null_obs(256)["image_primary"])


def test_bridge_episode_requeries_every_step(tmp_path):
    cfg = BridgeGenerateConfig(max_steps=6, pace_control=False, save_data=True,
                               save_dir=str(tmp_path))
    client = FakeWidowXClient()
    env = WidowXGym(client, cfg, blocking=False)
    env.reset()
    calls = []

    def policy(obs, task):
        calls.append(obs["full_image"].shape)
        return np.linspace(0, 1, 7, dtype=np.float32)

    stats = bridge_run_episode(cfg, env, "put the carrot on the plate", policy)
    assert stats["total_steps"] == 6
    assert len(calls) == 6  # Bridge requeries every control step
    assert all(s == (224, 224, 3) for s in calls)  # policy sees processed img
    assert len(client.actions) == 6
    data = np.load(tmp_path / "rollout-bridge-1.npz")
    assert data["actions"].shape == (6, 7)
    assert data["states"].shape == (6, 8)


def test_bridge_chunked_policy_uses_first_row():
    cfg = BridgeGenerateConfig(max_steps=2, pace_control=False)
    client = FakeWidowXClient()
    env = WidowXGym(client, cfg, blocking=False)
    env.reset()
    chunk = np.stack([np.full(7, 0.25), np.full(7, 0.9)])
    bridge_run_episode(cfg, env, "t", lambda o, t: chunk)
    np.testing.assert_allclose(client.actions[0], chunk[0])


def test_bridge_run_eval():
    cfg = BridgeGenerateConfig(max_steps=3, max_episodes=2, pace_control=False)
    client = FakeWidowXClient()
    env = WidowXGym(client, cfg, blocking=False)
    out = bridge_run_eval(cfg, env, lambda o, t: np.zeros(7), ["a", "b", "c"])
    assert out["num_episodes"] == 2  # capped at max_episodes


def test_refresh_obs_updates_in_place():
    client = FakeWidowXClient()
    env = WidowXGym(client, BridgeGenerateConfig(), blocking=False)
    obs = refresh_obs({}, env)
    assert set(obs) == {"full_image", "image_primary", "proprio"}


# ---------------------------------------------------------------- server


def test_payload_roundtrip_mixed_tree():
    obj = {
        "instruction": "pick up the cube",
        "full_image": np.arange(12, dtype=np.uint8).reshape(2, 2, 3),
        "proprio": np.linspace(-1, 1, 7),
        "nested": {"k": [np.float32(1.5), "s", 3]},
    }
    out = decode_payload(encode_payload(obj))
    np.testing.assert_array_equal(out["full_image"], obj["full_image"])
    assert out["full_image"].dtype == np.uint8
    np.testing.assert_allclose(out["proprio"], obj["proprio"])
    assert out["instruction"] == obj["instruction"]
    assert out["nested"]["k"][0] == 1.5


@pytest.fixture()
def server():
    seen = []

    def policy(obs, instruction):
        seen.append((sorted(obs.keys()), instruction))
        return np.full((8, 7), 0.5, np.float32) + obs["proprio"][None, :7]

    srv = ActionServer(policy, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv, seen
    srv.shutdown()


def test_action_server_act_roundtrip(server):
    srv, seen = server
    obs = {
        "instruction": "wipe the table",
        "full_image": np.zeros((224, 224, 3), np.uint8),
        "proprio": np.arange(7.0),
    }
    action = get_action_from_server(obs, f"http://127.0.0.1:{srv.port}/act")
    assert action.shape == (8, 7)
    np.testing.assert_allclose(action[0], 0.5 + np.arange(7.0), rtol=1e-6)
    # instruction is popped out of the observation before the policy call
    assert seen[0] == (["full_image", "proprio"], "wipe the table")


def test_action_server_double_encoded_fallback(server):
    import json
    from urllib.request import Request, urlopen

    srv, _ = server
    inner = encode_payload(
        {"instruction": "t", "full_image": np.zeros((2, 2, 3), np.uint8),
         "proprio": np.zeros(7)}
    ).decode()
    body = json.dumps({"encoded": inner}).encode()
    req = Request(f"http://127.0.0.1:{srv.port}/act", data=body,
                  headers={"Content-Type": "application/json"})
    with urlopen(req, timeout=10) as resp:
        action = np.asarray(decode_payload(resp.read()))
    assert action.shape == (8, 7)


def test_action_server_bad_request_is_400(server):
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    srv, _ = server
    req = Request(f"http://127.0.0.1:{srv.port}/act", data=b'{"no_instruction": 1}',
                  headers={"Content-Type": "application/json"})
    with pytest.raises(HTTPError) as ei:
        urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_action_server_unknown_path_404(server):
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    srv, _ = server
    req = Request(f"http://127.0.0.1:{srv.port}/predict", data=b"{}")
    with pytest.raises(HTTPError) as ei:
        urlopen(req, timeout=10)
    assert ei.value.code == 404
