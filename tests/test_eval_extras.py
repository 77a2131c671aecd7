"""Tests for rollout video, training-time rollout callback sharding, and the
env-adapter action conventions."""

import numpy as np
import pytest

from mdt_policy_tpu.evaluation.training_callbacks import (
    RolloutLongHorizonCallback,
    shard_indices,
)
from mdt_policy_tpu.evaluation.fake_env import FakeEnv, RandomPolicy, ScriptedOracle
from mdt_policy_tpu.evaluation.video import RolloutVideo


def test_shard_indices_partition():
    parts = [shard_indices(1000, i, 4) for i in range(4)]
    flat = [i for p in parts for i in p]
    assert sorted(flat) == list(range(1000))
    assert all(len(p) == 250 for p in parts)


def test_callback_cadence_and_metrics(tmp_path):
    from mdt_policy_tpu.evaluation import get_sequences
    get_sequences.cache_clear()
    cb = RolloutLongHorizonCallback(
        FakeEnv(), ScriptedOracle(default=1),  # every task solves in 1 step
        goal_fn=lambda s: {"lang_text": s},
        num_sequences=4, ep_len=3, rollout_freq=5, skip_epochs=19)
    assert cb(RandomPolicy(), epoch=3) is None       # before skip_epochs
    assert cb(RandomPolicy(), epoch=21) is None      # off-cadence
    m = cb(RandomPolicy(), epoch=24)                 # 19 + 5
    assert m is not None
    assert m["eval_lh/avg_seq_len"] == 5.0
    assert m["eval_lh/sr_chain_5"] == 1.0


def test_rollout_video_writes_gif(tmp_path):
    rv = RolloutVideo(tmp_path)
    rv.new_video("t0", caption="open drawer")
    rv.new_subtask()
    for _ in range(3):
        rv.update(np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8))
    rv.draw_outcome(True)
    rv.add_language_instruction("open the drawer")
    path = rv.write()
    assert path is not None and path.exists() and path.suffix == ".gif"
    # success border painted green on the top rows
    assert np.array_equal(rv._frames[0][0, 0], [40, 180, 70])


def test_env_adapter_action_convention():
    """Gripper binarization without a real calvin_env: wrap a stub."""
    from mdt_policy_tpu.evaluation.env_adapter import CalvinEnvAdapter

    class StubEnv:
        def __init__(self):
            self.last_action = None
        def get_obs(self):
            return {"rgb_obs": {"rgb_static": np.zeros((8, 8, 3), np.uint8),
                                "rgb_gripper": np.zeros((8, 8, 3), np.uint8)},
                    "robot_obs": np.zeros(15)}
        def get_info(self):
            return {}
        def reset(self, robot_obs=None, scene_obs=None):
            return None
        def step(self, action):
            self.last_action = action
            return self.get_obs(), 0.0, False, {}

    stub = StubEnv()
    env = CalvinEnvAdapter(stub)
    obs = env.reset()
    assert obs["rgb_obs"]["rgb_static"].shape == (1, 1, 8, 8, 3)
    env.step(np.array([0.1, 0, 0, 0, 0, 0, 0.3]))
    assert stub.last_action["action"][-1] == 1.0  # gripper > 0 -> +1
    env.step(np.array([0.1, 0, 0, 0, 0, 0, -0.2]))
    assert stub.last_action["action"][-1] == -1.0
    assert stub.last_action["type"] == "cartesian_rel"


def test_single_task_rollout_dual_modalities():
    """The reference Rollout callback evaluates each task under BOTH goal
    modalities (rollout.py:302-330): lang = annotation sentence, vis = the
    demo's end state as a goal image. The policy double records which goal
    kind it was driven with; the scripted oracle solves one task."""
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    from mdt_policy_tpu.evaluation.single_task_rollout import SingleTaskRollout

    class RecordingPolicy:
        def __init__(self):
            self.goal_kinds = []

        def reset(self):
            pass

        def step(self, obs, goal):
            if "rgb_static_goal" in goal:
                self.goal_kinds.append("vis")
                assert np.asarray(goal["rgb_static_goal"]).dtype == np.uint8
            else:
                self.goal_kinds.append("lang")
                assert "lang_text" in goal
            return np.zeros(7)

    env = FakeEnv(img_hw=16)
    oracle = ScriptedOracle(solve_at={"open_drawer": 2, "close_drawer": 10**9})
    policy = RecordingPolicy()
    cb = SingleTaskRollout(
        env, oracle, goal_fn=lambda t: {"lang_text": f"do {t}"},
        ep_len=4, rollouts_per_task=2, modalities=("lang", "vis"))
    pairs = [({"robot_obs": np.zeros(15), "scene_obs": np.zeros(24)},
              {"robot_obs": np.ones(15), "scene_obs": np.ones(24)})] * 3
    metrics = cb(policy, {"open_drawer": pairs, "close_drawer": pairs})

    assert set(policy.goal_kinds) == {"lang", "vis"}
    assert metrics["tasks/open_drawer_lang_sr"] == 1.0
    assert metrics["tasks/open_drawer_vis_sr"] == 1.0
    assert metrics["tasks/close_drawer_lang_sr"] == 0.0
    assert metrics["tasks/average_lang_sr"] == 0.5
    assert metrics["tasks/average_vis_sr"] == 0.5
    assert metrics["tasks/average_sr"] == 0.5

    # single-modality keeps the historical metric names
    cb1 = SingleTaskRollout(env, oracle, goal_fn=lambda t: {"lang_text": t},
                            ep_len=4, rollouts_per_task=1)
    m1 = cb1(policy, {"open_drawer": pairs})
    assert "tasks/open_drawer_sr" in m1
