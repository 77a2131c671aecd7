"""End-to-end evaluate path: train a tiny run, restore its checkpoint via
evaluate.build_policy (full run-config re-hydration, agent dispatch, EMA
weights, sampler overrides), and run chains against the fake env through the
standard driver with the reference validation annotations."""

import numpy as np
import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, train
from test_training_cli import TINY_OVERRIDES


def _tiny_run(tmp_path, agent: str, run_name: str) -> RunConfig:
    return RunConfig(
        agent=agent, log_dir=str(tmp_path), run_name=run_name,
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1),
        agent_overrides=TINY_OVERRIDES,
    )


def test_build_policy_and_fake_eval(tmp_path):
    train(_tiny_run(tmp_path, "mdtv", "evalrun"))
    run_dir = tmp_path / "evalrun"
    # training snapshots the full config; evaluation re-hydrates it
    assert (run_dir / "config.yaml").exists()

    from mdt_policy_tpu.evaluate import build_policy
    policy, agent_cfg, run_cfg = build_policy(str(run_dir), sampler_type="euler",
                                              num_sampling_steps=2)
    assert run_cfg.agent == "mdtv"
    assert agent_cfg.sampler_type == "euler"
    assert agent_cfg.num_sampling_steps == 2

    from mdt_policy_tpu.evaluation import evaluate_policy, get_sequences, print_and_save
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    get_sequences.cache_clear()
    env = FakeEnv(img_hw=32, gripper_hw=32)
    oracle = ScriptedOracle(default=1)  # everything succeeds instantly

    goal_fn = make_goal_fn(agent_cfg.clip_context_length)

    results = evaluate_policy(policy, env, oracle, goal_fn, num_sequences=2,
                              ep_len=3, progress=False)
    assert results == [5, 5]
    data = print_and_save(results, 2, run_dir / "evaluation")
    assert data["avg_seq_len"] == 5.0
    assert (run_dir / "evaluation" / "results.json").exists()


def test_mdt_restore_and_evaluate(tmp_path):
    """The non-V variant restores and evaluates through the same CLI path
    (round-1 hardcoded MDTV; ref evaluation/utils.py:64-106 dispatches on the
    run config)."""
    train(_tiny_run(tmp_path, "mdt", "mdtrun"))
    run_dir = tmp_path / "mdtrun"

    from mdt_policy_tpu.evaluate import build_policy
    policy, agent_cfg, run_cfg = build_policy(str(run_dir), num_sampling_steps=2)
    assert run_cfg.agent == "mdt"

    from mdt_policy_tpu.evaluation import evaluate_policy, get_sequences
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    get_sequences.cache_clear()
    env = FakeEnv(img_hw=32, gripper_hw=32)
    oracle = ScriptedOracle(default=1)
    goal_fn = make_goal_fn(agent_cfg.clip_context_length)
    results = evaluate_policy(policy, env, oracle, goal_fn, num_sequences=1,
                              ep_len=3, progress=False)
    assert results == [5]


def test_scan_tower_run_restores_and_evaluates(tmp_path):
    """A run trained with scan_tower_layers=True checkpoints the stacked
    tower layout; the config snapshot carries the flag, so build_policy
    inits the matching model and the orbax restore lines up."""
    cfg = _tiny_run(tmp_path, "mdtv", "scanrun")
    cfg.agent_overrides = dict(TINY_OVERRIDES, scan_tower_layers=True)
    train(cfg)
    run_dir = tmp_path / "scanrun"

    from mdt_policy_tpu.evaluate import build_policy
    policy, agent_cfg, run_cfg = build_policy(str(run_dir), num_sampling_steps=2)
    assert agent_cfg.scan_tower_layers is True

    from mdt_policy_tpu.evaluation import evaluate_policy, get_sequences
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    get_sequences.cache_clear()
    env = FakeEnv(img_hw=32, gripper_hw=32)
    oracle = ScriptedOracle(default=1)
    goal_fn = make_goal_fn(agent_cfg.clip_context_length)
    results = evaluate_policy(policy, env, oracle, goal_fn, num_sequences=1,
                              ep_len=3, progress=False)
    assert results == [5]


def test_lang_embeddings_goal_reaches_policy(tmp_path):
    """Precomputed-embedding goals (the use_text_not_embedding=False path) run
    through MDTVPolicy.step without the CLIP text tower."""
    train(_tiny_run(tmp_path, "mdtv", "embrun"))
    run_dir = tmp_path / "embrun"

    from mdt_policy_tpu.evaluate import build_policy
    policy, agent_cfg, _ = build_policy(str(run_dir), num_sampling_steps=2)
    obs = {"rgb_obs": {
        "rgb_static": np.random.default_rng(0).integers(
            0, 255, (1, 1, 64, 64, 3)).astype(np.uint8),
        "rgb_gripper": np.random.default_rng(1).integers(
            0, 255, (1, 1, 64, 64, 3)).astype(np.uint8),
    }}
    goal = {"lang": np.zeros((1, TINY_OVERRIDES["goal_dim"]), np.float32),
            "lang_text": "pull the handle to open the drawer"}
    action = policy.step(obs, goal)
    assert np.asarray(action).shape == (1, 7)


def test_multistep_validation():
    """multistep > act_window_size must raise, not silently replay actions."""
    import dataclasses
    import jax
    from mdt_policy_tpu.agents import MDTVConfig, MDTVPolicy, init_agent

    cfg = dataclasses.replace(MDTVConfig(**TINY_OVERRIDES), multistep=11)
    example = {
        "rgb_static": np.zeros((1, 2, 32, 32, 3), np.float32),
        "rgb_gripper": np.zeros((1, 2, 32, 32, 3), np.float32),
        "gen_static": np.zeros((1, 32, 32, 3), np.float32),
        "gen_gripper": np.zeros((1, 32, 32, 3), np.float32),
        "actions": np.zeros((1, 10, 7), np.float32),
        "lang_tokens": np.zeros((1, 8), np.int32),
    }
    net, state = init_agent(cfg, jax.random.PRNGKey(0), example)
    with pytest.raises(ValueError, match="multistep"):
        MDTVPolicy(net, state.params)


def test_sweep_mode(tmp_path):
    """--sweep-* grid mode: one benchmark per sampler/steps/sigma_min combo,
    incremental sweep_results.json, best combo reported (the reference's
    sweep.yaml surface)."""
    import json

    train(_tiny_run(tmp_path, "mdtv", "sweeprun"))
    run_dir = tmp_path / "sweeprun"

    from mdt_policy_tpu.evaluate import main
    from mdt_policy_tpu.evaluation import get_sequences
    get_sequences.cache_clear()
    main(["--train-folder", str(run_dir), "--fake-env",
          "--num-sequences", "1", "--ep-len", "2",
          "--sweep-sampler", "ddim", "euler", "--sweep-steps", "2"])
    table = json.loads((run_dir / "evaluation" / "sweep_results.json").read_text())
    assert len(table) == 2
    assert {r["sampler"] for r in table} == {"ddim", "euler"}
    assert all(r["steps"] == 2 for r in table)
