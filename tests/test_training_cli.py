"""Smoke test of the training runtime: a tiny synthetic-data run executes two
epochs end-to-end (train steps, validation, checkpointing, metrics CSV,
auto-resume)."""

import dataclasses

import numpy as np
import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

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
                              keep_checkpoints=2, profile_steps="1:2"),
        agent_overrides=TINY_OVERRIDES,
    )
    state = train(cfg)
    assert int(state.step) == 4
    run_dir = tmp_path / "smoke"
    assert (run_dir / "metrics.csv").exists()
    # observability scalar parity (ref mdt_agent.py:181-192 +
    # LearningRateMonitor): grad/param norms and the live lr are logged
    header = (run_dir / "metrics.csv").read_text().splitlines()[0]
    for col in ("train/grad_norm", "train/param_norm", "train/lr"):
        assert col in header, col
    # masked-foresight reconstruction grid saved each validation epoch
    # (ref store_img branch, mdt/models/mdt_agent.py:398-417)
    assert list((run_dir / "media").glob("img_gen_pred_step*.png"))
    # trainer.profile_steps traced step 1 into run_dir/profile
    assert any((run_dir / "profile").rglob("*"))
    ckpts = sorted((run_dir / "checkpoints").iterdir())
    assert any(p.name == "4" for p in ckpts)

    # auto-resume: same run dir restores step 4 and finishes immediately
    state2 = train(cfg)
    assert int(state2.step) == 4


def test_mdt_variant_gets_validation_metrics(tmp_path):
    """val_act/* metrics are produced for the MDT (ResNet) variant too —
    validation_step lives on the base agent in the reference
    (mdt/models/mdt_agent.py:281-357), so both variants must report it."""
    cfg = RunConfig(
        agent="mdt",
        log_dir=str(tmp_path),
        run_name="mdt-val",
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1,
                              keep_checkpoints=0),
        agent_overrides=TINY_OVERRIDES,
    )
    state = train(cfg)
    assert int(state.step) == 1
    csv = (tmp_path / "mdt-val" / "metrics.csv").read_text()
    assert "val_act/action_loss" in csv


def _tiny_cfg(tmp_path, run_name, max_epochs, keep_checkpoints=1):
    return RunConfig(
        agent="mdtv",
        log_dir=str(tmp_path),
        run_name=run_name,
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=max_epochs,
                              steps_per_epoch=2, limit_val_batches=1, seed=0,
                              log_every=100, keep_checkpoints=keep_checkpoints),
        agent_overrides=TINY_OVERRIDES,
    )


def test_preemption_resume_is_bit_deterministic(tmp_path):
    """4 straight steps == 2 steps + preempt + resume 2 steps, bit-exact.

    Step/augmentation keys are fold_in(step) and the data stream
    fast-forwards on resume, so a preempted-and-resumed run must produce
    exactly the params of an uninterrupted one."""
    import jax

    straight = train(_tiny_cfg(tmp_path, "straight", max_epochs=2))
    part1 = train(_tiny_cfg(tmp_path, "resumed", max_epochs=1))
    assert int(part1.step) == 2
    resumed = train(_tiny_cfg(tmp_path, "resumed", max_epochs=2))
    assert int(resumed.step) == 4

    flat_a = jax.tree_util.tree_leaves(straight.params)
    flat_b = jax.tree_util.tree_leaves(resumed.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(straight.ema_params),
                    jax.tree_util.tree_leaves(resumed.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_checkpoints_and_exits(tmp_path):
    """Graceful preemption: SIGTERM mid-run finishes the in-flight step,
    writes a checkpoint at a non-epoch step, and returns cleanly."""
    import os
    import signal
    import threading

    cfg = _tiny_cfg(tmp_path, "preempt", max_epochs=50)

    # deliver SIGTERM once train() has armed its handler (installed at entry,
    # before backend init) — racing a fixed delay against compile time is
    # flaky on a loaded host
    import time

    default_handler = signal.getsignal(signal.SIGTERM)

    def _kill_when_armed():
        deadline = time.time() + 300
        while time.time() < deadline:
            if signal.getsignal(signal.SIGTERM) is not default_handler:
                break
            time.sleep(0.05)
        os.kill(os.getpid(), signal.SIGTERM)

    killer = threading.Thread(target=_kill_when_armed, daemon=True)
    killer.start()
    state = train(cfg)
    step = int(state.step)
    assert 0 < step < 100  # stopped long before max_epochs*steps_per_epoch
    assert (tmp_path / "preempt" / "checkpoints" / str(step)).exists()


def test_divergence_guard_halts_without_poisoned_checkpoint(tmp_path):
    """halt_on_nonfinite: an exploding run raises TrainingDivergedError at a
    log point and never checkpoints NaN params (SURVEY §5 failure
    detection — the reference has none)."""
    from mdt_policy_tpu.agents.config import LRSchedulerConfig, OptimizerConfig
    from mdt_policy_tpu.training import TrainingDivergedError

    cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path), run_name="diverge",
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=5, steps_per_epoch=20,
                              limit_val_batches=1, seed=0, log_every=1,
                              keep_checkpoints=1),
        # an absurd LR reliably reaches inf/NaN within a few AdamW steps
        agent_overrides=dict(
            TINY_OVERRIDES,
            optimizer=OptimizerConfig(learning_rate=1e18),
            lr_scheduler=LRSchedulerConfig(init_lr=1e18, init_lr_scale=1.0),
        ),
    )
    with pytest.raises(TrainingDivergedError):
        train(cfg)
    ckpts = tmp_path / "diverge" / "checkpoints"
    if ckpts.exists():
        import jax
        from mdt_policy_tpu.utils.checkpoint import latest_checkpoint
        assert latest_checkpoint(ckpts) is None  # nothing was saved


def test_load_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("agent: mdt\ntrainer:\n  batch_size: 7\n")
    cfg = load_config(str(p), ["trainer.max_epochs=3", "data.min_window_size=22",
                               "trainer.profile_steps=50:60"])
    assert cfg.agent == "mdt"
    assert cfg.trainer.batch_size == 7
    assert cfg.trainer.max_epochs == 3
    assert cfg.data.min_window_size == 22
    # YAML 1.1 sexagesimal footgun: "50:60" must stay a range string, not 3060
    assert cfg.trainer.profile_steps == "50:60"


def test_aot_step_cache_roundtrip(tmp_path, caplog):
    """trainer.aot_step_cache: the first run compiles the step and saves a
    serialized executable; a FRESH run (new run dir, same cache dir) loads
    it instead of compiling (utils/aot_cache.py — the warm-restart lever:
    deserialize ~19 s vs 140-560 s remote compile, docs/BENCHMARKING.md).
    A stale/foreign blob must fall back to a normal compile."""
    import logging

    cache_dir = tmp_path / "blobs"

    def run(name):
        cfg = RunConfig(
            agent="mdtv", log_dir=str(tmp_path), run_name=name,
            data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                            synthetic_gripper_hw=32),
            trainer=TrainerConfig(batch_size=2, max_epochs=1,
                                  steps_per_epoch=2, limit_val_batches=1,
                                  seed=0, log_every=2, keep_checkpoints=0,
                                  log_recon_images=False,
                                  aot_step_cache=str(cache_dir)),
            agent_overrides=TINY_OVERRIDES,
        )
        with caplog.at_level(logging.INFO, logger="mdt_policy_tpu"):
            caplog.clear()
            state = train(cfg)
        statuses = [r.message for r in caplog.records
                    if "aot_step_cache:" in r.message]
        assert statuses, "train() did not report the aot cache status"
        return state, statuses[-1]

    state1, s1 = run("aot_a")
    assert int(state1.step) == 2
    assert "miss" in s1
    blobs = list(cache_dir.glob("train_step-*.jaxexe"))
    assert len(blobs) == 1

    state2, s2 = run("aot_b")
    assert int(state2.step) == 2
    assert "hit" in s2

    # corrupt the blob: the next run must recompile, not crash
    blobs[0].write_bytes(b"not an executable")
    state3, s3 = run("aot_c")
    assert int(state3.step) == 2
    assert "miss" in s3
