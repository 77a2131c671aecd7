"""Standalone evaluation entry point — the `mdt_evaluate` CLI equivalent
(`mdt/evaluation/mdt_evaluate.py:223-283`):

    python -m mdt_policy_tpu.evaluate --train-folder runs/<name> \
        --dataset-path /data/task_D_D/validation \
        --sampler ddim --steps 10 --sigma-min 0.001 --sigma-max 80

* re-reads the training run's FULL config snapshot (the run dir is the source
  of truth, ref evaluation/utils.py:159-163) and instantiates whichever agent
  it names (mdt or mdtv, ref evaluation/utils.py:64-106),
* restores the BEST checkpoint's EMA weights (ref :92-103), applies eval-time
  sampler overrides (conf/mdt_evaluate.yaml:27-35),
* evaluates every subtask with its reference VALIDATION annotation sentence
  (conf/annotations/new_playtable_validation.yaml; synthesized task-name text
  would shift the goal distribution) — either tokenized for the in-program
  CLIP text tower or, with --use-embeddings, looked up from the dataset's
  precomputed embeddings.npy (LangEmbeddings, ref evaluation/utils.py:219-240),
* builds the task oracle from the vendored symbolic task definitions
  (conf/callbacks/rollout/tasks/new_playtable_tasks.yaml),
* runs the 1000-chain benchmark against calvin_env (or `--fake-env` for a
  sim-free smoke run), writes results.json (ref print_and_save).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def load_run_config(train_folder):
    """Re-hydrate the training run's config snapshot (ref the .hydra/config.yaml
    re-read, evaluation/utils.py:159-163). Falls back to defaults when the run
    predates snapshots."""
    from mdt_policy_tpu.training import load_config

    cfg_file = Path(train_folder) / "config.yaml"
    return load_config(str(cfg_file) if cfg_file.exists() else None, [])


def load_run_agent(train_folder, *, use_ema: bool = True,
                   cfg_replace: dict | None = None):
    """Restore a run's agent net + weights from its config snapshot + best
    checkpoint (shared by the evaluate CLI and the offline embedding
    extractor, data/extract_embeddings.py). Returns
    (net, params, agent_cfg, run_cfg)."""
    import jax
    from mdt_policy_tpu.agents import (MDTConfig, MDTVConfig,
                                       init_agent, init_mdt_agent)
    from mdt_policy_tpu.utils.checkpoint import Checkpointer

    from mdt_policy_tpu.agents.config import filter_retired_overrides

    train_folder = Path(train_folder)
    run_cfg = load_run_config(train_folder)
    overrides = filter_retired_overrides(run_cfg.agent_overrides)
    # agent selection from the run config (ref load_pl_module_from_checkpoint
    # instantiates whatever _target_ the run names, evaluation/utils.py:64-106)
    if run_cfg.agent == "mdt":
        agent_cfg, init = MDTConfig(**overrides), init_mdt_agent
    elif run_cfg.agent == "mdtv":
        agent_cfg, init = MDTVConfig(**overrides), init_agent
    else:
        raise ValueError(f"unknown agent {run_cfg.agent!r} in run config")
    agent_cfg = dataclasses.replace(agent_cfg, **(cfg_replace or {}))

    example = {
        "rgb_static": np.zeros((1, 2, agent_cfg.img_size, agent_cfg.img_size, 3), np.float32),
        "rgb_gripper": np.zeros((1, 2, agent_cfg.img_size, agent_cfg.img_size, 3), np.float32),
        "gen_static": np.zeros((1, agent_cfg.gen_img_res, agent_cfg.gen_img_res, 3), np.float32),
        "gen_gripper": np.zeros((1, agent_cfg.gen_img_res, agent_cfg.gen_img_res, 3), np.float32),
        "actions": np.zeros((1, agent_cfg.act_window_size, agent_cfg.action_dim), np.float32),
        "lang_tokens": np.zeros((1, agent_cfg.clip_context_length), np.int32),
    }
    net, state = init(agent_cfg, jax.random.PRNGKey(0), example)
    ck = Checkpointer(train_folder / "checkpoints")
    step = ck.best_step()
    state = ck.restore(state, step=step)
    params = state.ema_params if use_ema else state.params
    logger.info("restored %s agent, %s weights from step %s", run_cfg.agent,
                "EMA" if use_ema else "raw", int(state.step))
    return net, params, agent_cfg, run_cfg


def build_policy(train_folder: str, *, sampler_type=None, num_sampling_steps=None,
                 sigma_min=None, sigma_max=None, noise_scheduler=None,
                 multistep=None, use_ema: bool = True):
    """Restore the run's agent (mdt or mdtv, per its config snapshot) + EMA
    params and wrap as a rollout policy with sampler overrides."""
    # eval-time sampler overrides (ref mdt_evaluate.py:247-256)
    replace = {}
    if sampler_type: replace["sampler_type"] = sampler_type
    if num_sampling_steps: replace["num_sampling_steps"] = num_sampling_steps
    if sigma_min is not None: replace["sigma_min"] = sigma_min
    if sigma_max is not None: replace["sigma_max"] = sigma_max
    if noise_scheduler: replace["noise_scheduler"] = noise_scheduler
    if multistep: replace["multistep"] = multistep

    net, params, agent_cfg, run_cfg = load_run_agent(
        train_folder, use_ema=use_ema, cfg_replace=replace)
    from mdt_policy_tpu.evaluation.policy_adapter import make_rollout_policy
    return make_rollout_policy(net, params), agent_cfg, run_cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-folder", required=True)
    ap.add_argument("--dataset-path", default=None, help="CALVIN validation dir")
    ap.add_argument("--num-sequences", type=int, default=1000)
    ap.add_argument("--ep-len", type=int, default=360)
    ap.add_argument("--sampler", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--sigma-min", type=float, default=None)
    ap.add_argument("--sigma-max", type=float, default=None)
    ap.add_argument("--noise-scheduler", default=None)
    ap.add_argument("--multistep", type=int, default=None)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--num-videos", type=int, default=0,
                    help="record the first N chains as GIF/mp4 under "
                         "<train_folder>/evaluation/videos (ref "
                         "conf/mdt_evaluate.yaml num_videos)")
    ap.add_argument("--use-embeddings", action="store_true",
                    help="goal = precomputed embeddings.npy lookup instead of "
                         "in-program CLIP text encoding (the reference's "
                         "use_text_not_embedding=False path)")
    ap.add_argument("--fake-env", action="store_true",
                    help="protocol smoke run without PyBullet")
    ap.add_argument("--debug", action="store_true",
                    help="per-chain subtask/goal logging (ref mdt_evaluate.py "
                         "cfg.debug prints)")
    # sweep mode (the reference's sweep.yaml surface: sampler x steps x
    # sigma_min grid, each combo a full benchmark)
    ap.add_argument("--sweep-sampler", nargs="+", default=None)
    ap.add_argument("--sweep-steps", nargs="+", type=int, default=None)
    ap.add_argument("--sweep-sigma-min", nargs="+", type=float, default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    if args.sweep_sampler or args.sweep_steps or args.sweep_sigma_min:
        return _sweep(args)

    from mdt_policy_tpu.evaluation import evaluate_policy, print_and_save
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn, make_task_oracle

    policy, agent_cfg, run_cfg = build_policy(
        args.train_folder, sampler_type=args.sampler,
        num_sampling_steps=args.steps, sigma_min=args.sigma_min,
        sigma_max=args.sigma_max, noise_scheduler=args.noise_scheduler,
        multistep=args.multistep, use_ema=not args.no_ema)

    if args.fake_env:
        from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
        env, oracle = FakeEnv(img_hw=64), ScriptedOracle(default=10 ** 9)
    else:
        from mdt_policy_tpu.evaluation.env_adapter import make_calvin_env
        env = make_calvin_env(args.dataset_path)
        oracle = make_task_oracle()

    lang_embeddings = None
    if args.use_embeddings:
        from mdt_policy_tpu.evaluation.rollout import LangEmbeddings
        if args.dataset_path is None:
            raise SystemExit("--use-embeddings needs --dataset-path "
                             "(embeddings.npy lives in the dataset)")
        lang_embeddings = LangEmbeddings(args.dataset_path,
                                         lang_folder=run_cfg.data.lang_folder)
    goal_fn = make_goal_fn(agent_cfg.clip_context_length,
                           lang_embeddings=lang_embeddings)

    results = evaluate_policy(policy, env, oracle, goal_fn,
                              num_sequences=args.num_sequences,
                              ep_len=args.ep_len, num_videos=args.num_videos,
                              video_dir=Path(args.train_folder) / "evaluation"
                              / "videos")
    data = print_and_save(results, args.num_sequences,
                          Path(args.train_folder) / "evaluation")
    print(json.dumps({"avg_seq_len": data["avg_seq_len"],
                      "chain_sr": data["chain_sr"]}, indent=2))


def _sweep(args):
    """Grid over sampler x steps x sigma_min, one benchmark per combo (the
    reference's wandb sweep surface, sweep.yaml:9-22); writes
    sweep_results.json under <train_folder>/evaluation."""
    import itertools

    from mdt_policy_tpu.evaluation import evaluate_policy
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn, make_task_oracle

    samplers = args.sweep_sampler or [args.sampler or "ddim"]
    steps_grid = args.sweep_steps or [args.steps or 10]
    sigma_mins = args.sweep_sigma_min or [args.sigma_min]

    if args.fake_env:
        from mdt_policy_tpu.evaluation.fake_env import FakeEnv, ScriptedOracle
        env, oracle = FakeEnv(img_hw=64), ScriptedOracle(default=10 ** 9)
    else:
        from mdt_policy_tpu.evaluation.env_adapter import make_calvin_env
        env = make_calvin_env(args.dataset_path)
        oracle = make_task_oracle()

    out = Path(args.train_folder) / "evaluation"
    out.mkdir(parents=True, exist_ok=True)
    table = []
    for sampler, steps, smin in itertools.product(samplers, steps_grid, sigma_mins):
        policy, agent_cfg, _ = build_policy(
            args.train_folder, sampler_type=sampler, num_sampling_steps=steps,
            sigma_min=smin, sigma_max=args.sigma_max,
            noise_scheduler=args.noise_scheduler, use_ema=not args.no_ema)
        goal_fn = make_goal_fn(agent_cfg.clip_context_length)
        results = evaluate_policy(policy, env, oracle, goal_fn,
                                  num_sequences=args.num_sequences,
                                  ep_len=args.ep_len, progress=False)
        avg = float(np.mean(results))
        row = {"sampler": sampler, "steps": steps, "sigma_min": smin,
               "avg_seq_len": avg}
        table.append(row)
        logger.info("sweep %s", row)
        # incremental write: a failing later combo never loses finished rows
        (out / "sweep_results.json").write_text(json.dumps(table, indent=2))
    best = max(table, key=lambda r: r["avg_seq_len"])
    print(json.dumps({"sweep": table, "best": best}, indent=2))


if __name__ == "__main__":
    main()
