"""Smoke test of the training runtime: a tiny synthetic-data run executes two
epochs end-to-end (train steps, validation, checkpointing, metrics CSV,
auto-resume)."""

import dataclasses

import numpy as np
import pytest

from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, load_config, train

TINY_OVERRIDES = dict(
    latent_dim=32, embed_dim=32, obs_dim=32, goal_dim=16, clip_embed_dim=16,
    n_enc_layers=1, n_dec_layers=1, n_heads=2,
    perceiver_dim=32, perceiver_depth=1, perceiver_heads=2, perceiver_dim_head=8,
    num_latents=3, img_size=32, vit_patch=16, vit_depth=1, vit_heads=2,
    clip_vision_width=32, clip_vision_layers=1, clip_vision_patch=16,
    clip_text_width=16, clip_text_layers=1, clip_text_heads=2,
    clip_context_length=8, clip_vocab_size=100,
    gen_img_res=32, gen_patch_size=16, gen_decoder_depth=1, gen_decoder_dim=16,
    gen_decoder_heads=2, num_sampling_steps=2,
)


def test_synthetic_train_run(tmp_path):
    cfg = RunConfig(
        agent="mdtv",
        log_dir=str(tmp_path),
        run_name="smoke",
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(batch_size=2, max_epochs=2, steps_per_epoch=2,
                              limit_val_batches=1, seed=0, log_every=2,
                              keep_checkpoints=2),
        agent_overrides=TINY_OVERRIDES,
    )
    state = train(cfg)
    assert int(state.step) == 4
    run_dir = tmp_path / "smoke"
    assert (run_dir / "metrics.csv").exists()
    ckpts = sorted((run_dir / "checkpoints").iterdir())
    assert any(p.name == "4" for p in ckpts)

    # auto-resume: same run dir restores step 4 and finishes immediately
    state2 = train(cfg)
    assert int(state2.step) == 4


def test_load_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("agent: mdt\ntrainer:\n  batch_size: 7\n")
    cfg = load_config(str(p), ["trainer.max_epochs=3", "data.min_window_size=22"])
    assert cfg.agent == "mdt"
    assert cfg.trainer.batch_size == 7
    assert cfg.trainer.max_epochs == 3
    assert cfg.data.min_window_size == 22
