"""End-to-end training over an on-disk synthetic CALVIN dataset: real loader
path (episode npz files, extracted actions, language annotations, BPE
tokenization), on-device preprocessing, two optimizer steps, validation on
the validation split."""

from pathlib import Path

import numpy as np
import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

from mdt_policy_tpu.data import extract_by_key

H = 32


def _write_split(root: Path, n_frames: int, rng):
    root.mkdir(parents=True)
    bounds = np.array([[0, n_frames - 1]])
    np.save(root / "ep_start_end_ids.npy", bounds)
    for i in range(n_frames):
        np.savez(root / f"episode_{i:07d}.npz",
                 rgb_static=rng.integers(0, 255, (H, H, 3), dtype=np.uint8),
                 rgb_gripper=rng.integers(0, 255, (H, H, 3), dtype=np.uint8),
                 depth_static=rng.uniform(0.1, 2.0, (H, H)).astype(np.float32),
                 depth_gripper=rng.uniform(0.1, 2.0, (H, H)).astype(np.float32),
                 robot_obs=np.zeros(15, np.float32),
                 scene_obs=np.zeros(24, np.float32),
                 rel_actions=rng.uniform(-1, 1, 7).astype(np.float32))
    lang = {
        "info": {"indx": [(0, n_frames - 1)]},
        "language": {"emb": rng.normal(size=(1, 1, 384)).astype(np.float32),
                     "ann": ["open the drawer"]},
    }
    lang_dir = root / "lang_clip_resnet50"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy", lang, allow_pickle=True)
    extract_by_key(root, "rel_actions")


def test_train_two_steps_on_disk_dataset(tmp_path):
    pytest.importorskip("regex")
    try:
        from mdt_policy_tpu.utils.clip_tokenizer import default_bpe_path
        default_bpe_path()
    except FileNotFoundError:
        pytest.skip("BPE vocab not available")

    rng = np.random.default_rng(0)
    data_root = tmp_path / "calvin"
    _write_split(data_root / "training", 60, rng)
    _write_split(data_root / "validation", 40, rng)

    from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, train
    from test_training_cli import TINY_OVERRIDES

    overrides = dict(TINY_OVERRIDES)
    overrides.update(clip_vocab_size=49408, clip_context_length=16)
    cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path / "runs"), run_name="realdata",
        data=DataConfig(root_data_dir=str(data_root), min_window_size=21,
                        max_window_size=30),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=2,
                              limit_val_batches=1, seed=0, log_every=1),
        agent_overrides=overrides,
    )
    state = train(cfg)
    assert int(state.step) == 2
    run_dir = tmp_path / "runs" / "realdata"
    assert (run_dir / "metrics.csv").exists()
    # validation metrics logged from the validation split
    csv = (run_dir / "metrics.csv").read_text()
    assert "val_act/action_loss" in csv


def test_train_with_depth_keys(tmp_path):
    """data.depth_keys loads depth observations through the full CLI path
    (ref episode_utils.py:97-125 + calvin_transforms.yaml depth pipelines)."""
    pytest.importorskip("regex")
    try:
        from mdt_policy_tpu.utils.clip_tokenizer import default_bpe_path
        default_bpe_path()
    except FileNotFoundError:
        pytest.skip("BPE vocab not available")

    rng = np.random.default_rng(1)
    data_root = tmp_path / "calvin"
    _write_split(data_root / "training", 60, rng)

    from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, train
    from test_training_cli import TINY_OVERRIDES

    overrides = dict(TINY_OVERRIDES)
    overrides.update(clip_vocab_size=49408, clip_context_length=16)
    cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path / "runs"), run_name="depthrun",
        data=DataConfig(root_data_dir=str(data_root), min_window_size=21,
                        max_window_size=30,
                        depth_keys=["depth_static", "depth_gripper"]),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1,
                              keep_checkpoints=0),
        agent_overrides=overrides,
    )
    state = train(cfg)
    assert int(state.step) == 1


def test_single_task_rollout_callback_in_training(tmp_path):
    """The reference's validation-time `Rollout` callback through the
    training CLI (VERDICT r2 item 5): demo discovery from validation
    batches, task-dict persistence beside the run, per-task SR metrics
    (ref mdt/rollout/rollout.py:58-118,275-372,404-415)."""
    pytest.importorskip("regex")
    try:
        from mdt_policy_tpu.utils.clip_tokenizer import default_bpe_path
        default_bpe_path()
    except FileNotFoundError:
        pytest.skip("BPE vocab not available")

    rng = np.random.default_rng(2)
    data_root = tmp_path / "calvin"
    _write_split(data_root / "training", 60, rng)
    _write_split(data_root / "validation", 40, rng)

    from mdt_policy_tpu.training import (DataConfig, RunConfig,
                                         TaskRolloutConfig, TrainerConfig,
                                         train)
    from test_training_cli import TINY_OVERRIDES

    overrides = dict(TINY_OVERRIDES)
    overrides.update(clip_vocab_size=49408, clip_context_length=16,
                     multistep=2)
    cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path / "runs"), run_name="taskroll",
        data=DataConfig(root_data_dir=str(data_root), min_window_size=21,
                        max_window_size=30),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1,
                              keep_checkpoints=0),
        task_rollout=TaskRolloutConfig(
            enabled=True, skip_epochs=0, rollout_freq=1, rollouts_per_task=1,
            ep_len=4, discovery_batches=1,
            id_selection_strategy="select_first",
            env_target="fake_targets.make_env",
            oracle_target="fake_targets.make_oracle"),
        agent_overrides=overrides,
    )
    state = train(cfg)
    assert int(state.step) == 1
    run_dir = tmp_path / "runs" / "taskroll"
    # discovered task dictionary persisted beside the run (ref rollout.py:404-415)
    assert (run_dir / "task_dict.npy").exists()
    csv = (run_dir / "metrics.csv").read_text()
    assert "tasks/open_drawer_vis_sr" in csv
    assert "tasks/open_drawer_lang_sr" in csv
    assert "tasks/average_sr" in csv


def test_preprocessor_depth_pipeline():
    """Train pipeline: per-sample gamma noise on depth_static + gaussian on
    both; eval pipeline passes depth through untouched."""
    import jax
    from mdt_policy_tpu.data.loader import Preprocessor

    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "rgb_static": rng.integers(0, 255, (B, 2, 16, 16, 3), dtype=np.uint8),
        "rgb_gripper": rng.integers(0, 255, (B, 2, 16, 16, 3), dtype=np.uint8),
        "gen_static": rng.integers(0, 255, (B, 16, 16, 3), dtype=np.uint8),
        "gen_gripper": rng.integers(0, 255, (B, 16, 16, 3), dtype=np.uint8),
        "actions": rng.normal(size=(B, 10, 7)).astype(np.float32),
        "depth_static": rng.uniform(0.5, 2.0, (B, 2, 16, 16)).astype(np.float32),
        "depth_gripper": rng.uniform(0.5, 2.0, (B, 2, 16, 16)).astype(np.float32),
    }
    pp = Preprocessor(static_size=16, gripper_size=16, gen_size=16)
    out = pp.train_batch(jax.random.PRNGKey(0), batch)
    ds = np.asarray(out["depth_static"])
    assert ds.shape == batch["depth_static"].shape
    # gamma(1000)/1000 is ~1 +- 3%; gaussian sigma 0.01 — noised but close
    assert not np.allclose(ds, batch["depth_static"])
    np.testing.assert_allclose(ds, batch["depth_static"], atol=0.3)
    # per-sample gamma: the multiplicative factor differs across samples
    ratios = (ds / batch["depth_static"]).reshape(B, -1).mean(axis=1)
    assert np.std(ratios) > 1e-5
    dg = np.asarray(out["depth_gripper"])
    np.testing.assert_allclose(dg, batch["depth_gripper"], atol=0.1)
    ev = pp.eval_batch(batch)
    np.testing.assert_array_equal(np.asarray(ev["depth_static"]),
                                  batch["depth_static"])
