"""End-to-end training over an on-disk synthetic CALVIN dataset: real loader
path (episode npz files, extracted actions, language annotations, BPE
tokenization), on-device preprocessing, two optimizer steps, validation on
the validation split."""

from pathlib import Path

import numpy as np
import pytest

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
        trainer=TrainerConfig(batch_size=2, max_epochs=1, steps_per_epoch=2,
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
