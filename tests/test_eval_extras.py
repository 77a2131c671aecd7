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
