"""End-to-end evaluate path: train a tiny run, restore its checkpoint via
evaluate.build_policy (EMA weights + sampler overrides), and run chains
against the fake env through the standard driver."""

import numpy as np
import pytest

from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, train
from test_training_cli import TINY_OVERRIDES


def test_build_policy_and_fake_eval(tmp_path):
    import yaml
    cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path), run_name="evalrun",
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1),
        agent_overrides=TINY_OVERRIDES,
    )
    train(cfg)
    run_dir = tmp_path / "evalrun"
    (run_dir / "config.yaml").write_text(
        yaml.safe_dump({"agent_overrides": TINY_OVERRIDES}))

    from mdt_policy_tpu.evaluate import build_policy
    policy, agent_cfg = build_policy(str(run_dir), sampler_type="euler",
                                     num_sampling_steps=2)
    assert agent_cfg.sampler_type == "euler"
    assert agent_cfg.num_sampling_steps == 2

    from mdt_policy_tpu.evaluation import evaluate_policy, get_sequences, print_and_save
    from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
    get_sequences.cache_clear()
    env = FakeEnv(img_hw=32, gripper_hw=32)
    oracle = ScriptedOracle(default=1)  # everything succeeds instantly

    def goal_fn(subtask):
        return {"lang_tokens": np.zeros((1, agent_cfg.clip_context_length),
                                        np.int32),
                "lang_text": subtask}

    results = evaluate_policy(policy, env, oracle, goal_fn, num_sequences=2,
                              ep_len=3, progress=False)
    assert results == [5, 5]
    data = print_and_save(results, 2, run_dir / "evaluation")
    assert data["avg_seq_len"] == 5.0
    assert (run_dir / "evaluation" / "results.json").exists()
