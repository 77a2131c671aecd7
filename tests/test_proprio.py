"""Proprio/state pipeline: statistics.yaml loading, process_state slicing
semantics vs the reference formula (episode_utils.py:14-61), the dataset
state_obs/state-info/depth paths, and an agent train step with proprio fed
through the proprio_emb token."""

import dataclasses

import numpy as np
import pytest
import yaml

from mdt_policy_tpu.data.proprio import (
    ProprioConfig,
    get_state_info_dict,
    load_statistics,
    process_state,
)

MEAN = np.arange(15, dtype=np.float32) / 10.0
STD = np.linspace(0.5, 2.0, 15).astype(np.float32)


def write_stats(root):
    root.mkdir(parents=True, exist_ok=True)
    (root / "statistics.yaml").write_text(yaml.safe_dump({
        "robot_obs": [{
            "_target_": "mdt.utils.transforms.NormalizeVector",
            "mean": MEAN.tolist(), "std": STD.tolist(),
        }],
        "action": [{"_target_": "mdt.utils.transforms.SomethingElse"}],
    }))


class TestProcessState:
    def test_load_statistics(self, tmp_path):
        write_stats(tmp_path)
        stats = load_statistics(tmp_path)
        np.testing.assert_allclose(stats["robot_obs"]["mean"], MEAN)
        np.testing.assert_allclose(stats["robot_obs"]["std"], STD)
        assert "action" not in stats  # only NormalizeVector entries carry stats
        assert load_statistics(tmp_path / "nope") == {}

    def test_normalize_and_slice_matches_reference_formula(self):
        x = np.random.default_rng(0).normal(size=(4, 15)).astype(np.float32)
        stats = {"robot_obs": {"mean": MEAN, "std": STD}}
        out = process_state(x, stats)
        # reference: normalize all 15 dims, then concat slices [0:7] + [14:15]
        normalized = (x - MEAN) / STD
        expected = np.concatenate([normalized[:, 0:7], normalized[:, 14:15]], axis=1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)
        assert out.shape == (4, 8)

    def test_orientation_unnormalized_flag(self):
        x = np.random.default_rng(1).normal(size=(2, 15)).astype(np.float32)
        stats = {"robot_obs": {"mean": MEAN, "std": STD}}
        cfg = dataclasses.replace(ProprioConfig(), normalize_robot_orientation=False)
        out = process_state(x, stats, cfg)
        normalized = (x - MEAN) / STD
        normalized[:, 3:6] = x[:, 3:6]  # orientation stays raw
        expected = np.concatenate([normalized[:, 0:7], normalized[:, 14:15]], axis=1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_no_normalize(self):
        x = np.random.default_rng(2).normal(size=(2, 15)).astype(np.float32)
        cfg = dataclasses.replace(ProprioConfig(), normalize=False)
        out = process_state(x, {"robot_obs": {"mean": MEAN, "std": STD}}, cfg)
        expected = np.concatenate([x[:, 0:7], x[:, 14:15]], axis=1)
        np.testing.assert_array_equal(out, expected)

    def test_state_info_dict(self):
        ep = {"robot_obs": np.ones((3, 15)), "scene_obs": np.zeros((3, 24))}
        info = get_state_info_dict(ep)
        assert info["state_info"]["robot_obs"].shape == (3, 15)
        assert info["state_info"]["scene_obs"].shape == (3, 24)


@pytest.fixture()
def proprio_dir(tmp_path):
    from mdt_policy_tpu.data.bench_loader import generate_dataset
    from mdt_policy_tpu.data.extract import extract_by_key, extract_frames
    root = tmp_path / "validation"
    generate_dataset(root, 120, static_hw=32, gripper_hw=24, episode_len=60)
    write_stats(root)
    extract_by_key(root, "rel_actions")
    extract_frames(root)
    return root


class TestDatasetProprio:
    def test_sample_state_obs_and_scene_obs(self, proprio_dir):
        from mdt_policy_tpu.data.dataset import CalvinDataset
        ds = CalvinDataset(proprio_dir, key="vis", min_window_size=21,
                           max_window_size=30, proprio=True,
                           include_scene_obs=True)
        s = ds[0]
        assert s["state_obs"].shape == (1, 8)
        assert s["scene_obs"].shape == (2, 24)  # obs frame + goal frame
        # parity with manual processing of the RAW obs-frame robot_obs
        expected = process_state(s["robot_obs"][:1], ds.statistics)
        np.testing.assert_allclose(s["state_obs"], expected, rtol=1e-6)

    def test_get_batch_parity_with_proprio(self, proprio_dir):
        from mdt_policy_tpu.data.dataset import CalvinDataset
        ds = CalvinDataset(proprio_dir, key="vis", min_window_size=21,
                           max_window_size=30, proprio=True,
                           include_scene_obs=True)
        idxs = np.asarray([0, 5, 11])
        batch = ds.get_batch(idxs)
        singles = [ds[int(i)] for i in idxs]
        for k in ("state_obs", "scene_obs"):
            np.testing.assert_allclose(
                batch[k], np.stack([s[k] for s in singles]), rtol=1e-6,
                err_msg=k)

    def test_depth_keys_fall_back_to_npz(self, tmp_path):
        from mdt_policy_tpu.data.dataset import CalvinDataset
        root = tmp_path / "validation"
        root.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(60):
            np.savez(root / f"episode_{i:07d}.npz",
                     rgb_static=rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
                     rgb_gripper=rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
                     robot_obs=rng.normal(size=15).astype(np.float32),
                     scene_obs=rng.normal(size=24).astype(np.float32),
                     depth_static=rng.uniform(size=(16, 16)).astype(np.float32),
                     rel_actions=rng.normal(size=7).astype(np.float32))
        np.save(root / "ep_start_end_ids.npy", np.asarray([[0, 59]]))
        ds = CalvinDataset(root, key="vis", min_window_size=21, max_window_size=25,
                           use_extracted_rel_actions=False,
                           depth_keys=("depth_static",))
        s = ds[0]
        assert s["depth_static"].shape == (2, 16, 16)
        assert ds.get_batch(np.asarray([0])) is None  # depth -> per-sample path


def test_add_depth_noise_statistics():
    import jax
    from mdt_policy_tpu.data.transforms import add_depth_noise
    depth = np.full((8, 8), 2.0, np.float32)
    vals = [float(add_depth_noise(jax.random.PRNGKey(i), depth)[0, 0])
            for i in range(200)]
    ratio = np.asarray(vals) / 2.0
    # Gamma(1000)/1000: mean 1, std ~0.0316
    assert abs(ratio.mean() - 1.0) < 0.01
    assert 0.01 < ratio.std() < 0.1


@pytest.mark.slow  # full-agent compile, ~2 min on this host
def test_agent_train_step_with_proprio():
    """MDT-V train step consumes state_obs through proprio_emb: loss finite
    and the proprio_emb parameters receive gradient."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from test_training_cli import TINY_OVERRIDES

    cfg = MDTVConfig(**{**TINY_OVERRIDES, "use_proprio": True})
    rng = np.random.default_rng(0)
    def scope():
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(2, 2, 32, 32, 3)), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(2, 2, 32, 32, 3)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(2, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 100, size=(2, 8)), jnp.int32),
            "state_obs": jnp.asarray(rng.normal(size=(2, 1, 8)), jnp.float32),
        }
    batch = {"vis": scope(), "lang": scope()}
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    assert "proprio_emb" in state.params["inner"]
    before = jax.tree.map(np.asarray, state.params["inner"]["proprio_emb"])
    new_state, metrics = jax.jit(partial(train_step, net))(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/total_loss"]))
    after = jax.tree.map(np.asarray, new_state.params["inner"]["proprio_emb"])
    deltas = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), before, after))
    assert max(deltas) > 0.0, "proprio_emb params did not move"


def test_state_pairs_feed_task_discovery(proprio_dir):
    """End of the state-info chain: dataset scene_obs -> state pairs ->
    discover_tasks against the fake env/oracle."""
    from mdt_policy_tpu.data.dataset import CalvinDataset
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    from mdt_policy_tpu.evaluation.single_task_rollout import (
        discover_tasks, state_pairs_from_batch)

    ds = CalvinDataset(proprio_dir, key="vis", min_window_size=21,
                       max_window_size=30, include_scene_obs=True)
    batch = ds.get_batch(np.asarray([0, 1, 2]))
    pairs = state_pairs_from_batch(batch)
    assert len(pairs) == 3
    assert pairs[0][0]["scene_obs"].shape == (24,)

    class OneTaskOracle:
        def get_task_info(self, a, b):
            return {"open_drawer"}

    found = discover_tasks(FakeEnv(img_hw=16), OneTaskOracle(), pairs)
    assert found == {"open_drawer": [0, 1, 2]}
