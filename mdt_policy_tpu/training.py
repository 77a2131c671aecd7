"""Training entry point (L7 CLI + L5 runtime).

Replaces the reference's Hydra + PyTorch-Lightning stack (`mdt/training.py`)
with a dataclass/YAML config and a single jitted train step over a data mesh:

    python -m mdt_policy_tpu.training --config conf.yaml \
        data.root_data_dir=/data/task_D_D trainer.max_epochs=20

Reference recipe preserved (conf/config.yaml): 1000 steps/epoch, batch 128
per device-group, dual {'vis','lang'} streams, validation on 4 batches per
epoch, EMA weights maintained every step, checkpoint per epoch with
auto-resume from the newest checkpoint (training.py:46-50).

With no dataset configured the loop runs on synthetic batches — the smoke /
throughput-bench mode.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import threading
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DataConfig:
    root_data_dir: Optional[str] = None   # CALVIN split root (training/ + validation/)
    lang_folder: str = "lang_clip_resnet50"
    min_window_size: int = 21
    max_window_size: int = 50
    obs_seq_len: int = 1
    action_seq_len: int = 10
    img_gen_frame_diff: int = 3
    window_sampling_strategy: str = "geometric"
    use_extracted_rel_actions: bool = True
    use_extracted_frames: bool = True   # contiguous-image fast path if present
    # train from OFFLINE frozen-tower embeddings (data/extract_embeddings.py
    # must have been run on both splits): batches carry voltron_tokens +
    # image_latent_goal instead of camera frames and the train step never
    # executes the camera towers (~60 of ~75 TFLOP/step). mdtv only. The
    # cache is tied to the tower weights it was extracted with — warm-start
    # the run (trainer.pretrain_checkpoint) from the same towers so training-
    # time rollouts/conversions stay coherent.
    use_extracted_embeddings: bool = False
    # >0: cache-mode training samples one of K cached DrQ-shift-augmented
    # embedding variants per draw (extract_embeddings --aug-variants K must
    # have produced them) — restores the reference's RandomShiftsAug to the
    # fast path; 0 trains on clean eval-pipeline embeddings (no aug).
    # Validation always uses the clean arrays.
    embedding_aug_variants: int = 0
    num_workers: Optional[int] = None   # decode threads (None = min(8, cpus))
    proprio: bool = False               # 8-d state_obs via statistics.yaml
    # depth observation keys loaded from the episode files (e.g.
    # ['depth_static', 'depth_gripper']); train-time noise per the production
    # transform pipeline (gamma on depth_static, gaussian on both —
    # calvin_transforms.yaml, ref episode_utils.py:97-125)
    depth_keys: list = dataclasses.field(default_factory=list)
    # synthetic-data shapes (smoke mode)
    synthetic_static_hw: int = 200
    synthetic_gripper_hw: int = 84


@dataclasses.dataclass
class TrainerConfig:
    batch_size: int = 128          # per modality stream (conf/config.yaml:27)
    max_epochs: int = 20
    steps_per_epoch: int = 1000    # limit_train_batches (conf/config.yaml:50)
    limit_val_batches: int = 4     # (conf/config.yaml:51)
    seed: int = 242
    log_every: int = 50
    keep_checkpoints: int = 1
    # data-mesh size; None = every device that divides batch_size evenly
    # (with a warning when some are dropped); set explicitly for strictness —
    # a batch/device mismatch then errors instead of silently shrinking
    devices: Optional[int] = None
    # "START:STOP" step range traced with jax.profiler into
    # <run_dir>/profile (view in TensorBoard/Perfetto); None disables
    profile_steps: Optional[str] = None
    # warm-start: orbax checkpoint dir (a step dir or a run's checkpoints/
    # dir) whose params partially initialize a FRESH run — every leaf with a
    # matching path+shape is copied, the rest keep their random init (the
    # reference's pretrain_chk + load_state_dict(strict=False),
    # mdt/training.py:53-54, utils.py:32-42). Ignored when auto-resuming.
    pretrain_checkpoint: Optional[str] = None
    # divergence guard: raise TrainingDivergedError when the logged loss
    # goes non-finite (checked at log points only — no extra host syncs).
    # The poisoned state is never checkpointed; auto-resume restores the
    # last good save.
    halt_on_nonfinite: bool = True
    # save a masked-foresight reconstruction grid per validation epoch under
    # <run_dir>/media (+ wandb.Image when active) — the reference's store_img
    # validation branch (mdt/models/mdt_agent.py:398-417)
    log_recon_images: bool = True
    # Serialized-executable cache dir for the train-step program (opt-in;
    # None = off). On backends whose compile service costs minutes per fresh
    # process (and ignores the persistent XLA cache), a warm restart
    # deserializes the step executable in ~19 s instead of recompiling
    # 140-560 s (measured, docs/BENCHMARKING.md). Any stale/foreign blob
    # falls back to a normal compile. Relative paths resolve under the run
    # dir; "auto" uses <run_dir>/aot_cache.
    aot_step_cache: Optional[str] = None


class TrainingDivergedError(RuntimeError):
    """Loss went NaN/inf; the run halted without checkpointing the
    poisoned state."""


@dataclasses.dataclass
class RolloutConfig:
    """Training-time closed-loop CALVIN rollouts (the RolloutLongHorizon
    callback, conf/callbacks/rollout_lh/default.yaml)."""
    enabled: bool = False
    num_sequences: int = 1000
    ep_len: int = 360
    rollout_freq: int = 5          # epochs between rollouts
    skip_epochs: int = 19          # conf/config.yaml rollout_lh_skip_epochs
    val_dataset_path: Optional[str] = None   # calvin_env scene source


@dataclasses.dataclass
class TaskRolloutConfig:
    """Validation-time single-task rollouts — the reference's `Rollout`
    callback (mdt/rollout/rollout.py:58-118, conf/callbacks/rollout/
    default.yaml): discover solvable (start_state, task) demos from
    validation batches via the oracle, persist the task dictionary beside
    the run (the reference stores it in the Lightning ckpt,
    rollout.py:404-415), then roll the policy out per task and log
    `tasks/{task}_sr`."""
    enabled: bool = False
    skip_epochs: int = 10          # ref default.yaml:7
    rollout_freq: int = 5          # ref default.yaml:8
    rollouts_per_task: int = 10    # ref num_rollouts_per_task
    ep_len: int = 120              # ref default.yaml:13
    id_selection_strategy: str = "select_longest"  # ref default.yaml:21
    # dual goal modalities like the reference (lang sentence + demo end
    # frame as goal image, rollout.py:324-330)
    modalities: list = dataclasses.field(default_factory=lambda: ["vis", "lang"])
    discovery_batches: int = 4     # val batches scanned for solvable demos
    val_dataset_path: Optional[str] = None   # calvin_env scene source
    # dotted-path factories (the hydra `_target_` equivalent,
    # conf/callbacks/rollout/default.yaml env_cfg/tasks); tests point these
    # at the FakeEnv harness
    env_target: str = "mdt_policy_tpu.evaluation.env_adapter.make_calvin_env"
    oracle_target: str = "mdt_policy_tpu.evaluation.annotations.make_task_oracle"


@dataclasses.dataclass
class DistributedConfig:
    """Multi-host data parallelism (SURVEY §2.10: jax.distributed + one mesh
    spanning hosts; grad psum + contrastive all-gather ride ICI/DCN inside
    the same compiled program). trainer.batch_size is PER HOST — the loader
    shards the dataset per process and the global batch is assembled from
    per-process shards (parallel/mesh.py shard_batch)."""
    enabled: bool = False
    coordinator_address: Optional[str] = None  # host:port; None = TPU autodetect
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclasses.dataclass
class RunConfig:
    agent: str = "mdtv"            # 'mdtv' | 'mdt'
    log_dir: str = "runs"
    run_name: Optional[str] = None
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    rollout: RolloutConfig = dataclasses.field(default_factory=RolloutConfig)
    task_rollout: TaskRolloutConfig = dataclasses.field(
        default_factory=TaskRolloutConfig)
    distributed: DistributedConfig = dataclasses.field(
        default_factory=DistributedConfig)
    agent_overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)


def load_config(path: Optional[str], overrides) -> RunConfig:
    """YAML + dotted key=value overrides (the Hydra-style CLI surface)."""
    import yaml

    raw: Dict[str, Any] = {}
    if path:
        raw = yaml.safe_load(Path(path).read_text()) or {}
    for ov in overrides:
        key, _, val = ov.partition("=")
        node = raw
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        parsed = yaml.safe_load(val)
        if isinstance(parsed, int) and ":" in val:
            # YAML 1.1 reads "1:2" as sexagesimal 62 — keep range strings
            # (e.g. trainer.profile_steps=50:60) verbatim
            parsed = val
        node[parts[-1]] = parsed

    cfg = RunConfig()
    for section, cls in (("data", DataConfig), ("trainer", TrainerConfig),
                         ("rollout", RolloutConfig),
                         ("task_rollout", TaskRolloutConfig),
                         ("distributed", DistributedConfig)):
        if section in raw:
            setattr(cfg, section, cls(**{**dataclasses.asdict(getattr(cfg, section)),
                                         **raw[section]}))
    cfg.agent = raw.get("agent", cfg.agent)
    cfg.log_dir = raw.get("log_dir", cfg.log_dir)
    cfg.run_name = raw.get("run_name", cfg.run_name)
    cfg.agent_overrides = raw.get("agent_overrides", {})
    return cfg


def _make_agent(cfg: RunConfig):
    from mdt_policy_tpu.agents import MDTConfig, MDTVConfig
    from mdt_policy_tpu.agents.config import filter_retired_overrides
    overrides = filter_retired_overrides(cfg.agent_overrides)
    if cfg.agent == "mdtv":
        return MDTVConfig(**overrides)
    if cfg.agent == "mdt":
        return MDTConfig(**overrides)
    raise ValueError(f"unknown agent {cfg.agent!r}")


# Agent-config fields whose production default DIFFERS in embedding-cache
# mode (data.use_extracted_embeddings). Since round 4 the set is EMPTY:
# both of its former members won in full mode too and became MDTVConfig
# defaults (perceiver_factored_kv=True — 238.5 -> 140.2 ms cache /
# 762.6 -> 665.0 ms full; remat_perceiver=False — the factored perceiver
# holds no big residuals, so the recompute was pure waste, 665.0 -> 638.4
# ms full). The mechanism stays: train() applies these before the config
# snapshot (an explicit agent_overrides entry always wins) and
# cache_mode_config() is the out-of-CLI source of truth (bench.py).
CACHE_MODE_AGENT_DEFAULTS: Dict[str, Any] = {}


def cache_mode_config(**overrides):
    """The MDTVConfig the training CLI would run under
    data.use_extracted_embeddings with the given agent_overrides — the
    single source of truth for the cache-mode production configuration."""
    from mdt_policy_tpu.agents import MDTVConfig
    return MDTVConfig(**{**CACHE_MODE_AGENT_DEFAULTS, **overrides})


def _synthetic_batch(rng: np.random.Generator, B: int, data_cfg: DataConfig,
                     agent_cfg):
    hs, hg = data_cfg.synthetic_static_hw, data_cfg.synthetic_gripper_hw
    ctx, vocab = agent_cfg.clip_context_length, agent_cfg.clip_vocab_size
    def scope():
        return {
            "rgb_static": rng.integers(0, 255, (B, 2, hs, hs, 3)).astype(np.uint8),
            "rgb_gripper": rng.integers(0, 255, (B, 2, hg, hg, 3)).astype(np.uint8),
            "gen_static": rng.integers(0, 255, (B, hs, hs, 3)).astype(np.uint8),
            "gen_gripper": rng.integers(0, 255, (B, hg, hg, 3)).astype(np.uint8),
            "actions": rng.normal(size=(B, 10, 7)).astype(np.float32),
            "lang_tokens": rng.integers(1, vocab, (B, ctx)).astype(np.int32),
        }
    return {"vis": scope(), "lang": scope()}


def _real_loaders(cfg: RunConfig, split: str = "training", context_length: int = 77,
                  vocab_size: Optional[int] = None, start_batch: int = 0,
                  include_scene_obs: bool = False):
    from mdt_policy_tpu.data import BatchLoader, CalvinDataset, DualStreamLoader
    from mdt_policy_tpu.utils.clip_tokenizer import tokenize as _tokenize

    def tokenize(texts, n):
        ids = _tokenize(texts, n)
        # an out-of-range id silently NaNs the embedding lookup under jit —
        # fail loudly at the host seam instead
        if vocab_size is not None and ids.max() >= vocab_size:
            raise ValueError(
                f"tokenized id {int(ids.max())} >= agent clip_vocab_size "
                f"{vocab_size}; the agent's text tower is too small for real "
                "CLIP-BPE text")
        return ids

    root = Path(cfg.data.root_data_dir) / split
    kw = dict(lang_folder=cfg.data.lang_folder,
              obs_seq_len=cfg.data.obs_seq_len,
              action_seq_len=cfg.data.action_seq_len,
              min_window_size=cfg.data.min_window_size,
              max_window_size=cfg.data.max_window_size,
              img_gen_frame_diff=cfg.data.img_gen_frame_diff,
              window_sampling_strategy=cfg.data.window_sampling_strategy,
              use_extracted_rel_actions=cfg.data.use_extracted_rel_actions,
              use_extracted_frames=cfg.data.use_extracted_frames,
              use_extracted_embeddings=cfg.data.use_extracted_embeddings,
              # validation keeps clean embeddings (CalvinDataset also guards
              # on its own `validation` flag; this keeps the intent explicit)
              embedding_aug_variants=(cfg.data.embedding_aug_variants
                                      if split == "training" else 0),
              proprio=cfg.data.proprio,
              depth_keys=tuple(cfg.data.depth_keys),
              include_scene_obs=include_scene_obs,
              seed=cfg.trainer.seed)
    import jax

    tok = lambda texts, n: tokenize(texts, n)
    # per-host sharding: each host decodes only its slice of the global batch
    shard = dict(shard_index=jax.process_index(), num_shards=jax.process_count(),
                 num_workers=cfg.data.num_workers, start_batch=start_batch)
    vis = BatchLoader(CalvinDataset(root, key="vis", **kw), cfg.trainer.batch_size,
                      seed=cfg.trainer.seed, **shard)
    lang = BatchLoader(CalvinDataset(root, key="lang", **kw), cfg.trainer.batch_size,
                       seed=cfg.trainer.seed + 1, tokenizer=tok,
                       context_length=context_length, **shard)
    return DualStreamLoader(vis, lang)


def _load_pretrain_params(path: str) -> Dict[str, Any]:
    """Params tree from an orbax checkpoint: `path` is a step dir or a run's
    checkpoints/ dir (newest step used). Returned as raw host arrays for
    partial merging into a fresh init."""
    import orbax.checkpoint as ocp

    from mdt_policy_tpu.utils.checkpoint import latest_checkpoint

    p = Path(path)
    if not (p / "_CHECKPOINT_METADATA").exists():
        newest = latest_checkpoint(p)
        if newest is None:
            raise FileNotFoundError(f"no checkpoint under {p}")
        p = newest
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(p.resolve())
    if "params" not in tree:
        raise ValueError(f"checkpoint {p} has no 'params' tree")
    return tree["params"]


class _NullLogger:
    """Metrics sink for non-lead processes in multi-host runs."""

    def log(self, metrics, step):
        pass

    def info(self, msg, *args):
        pass

    def finish(self):
        pass


def _init_distributed(cfg: DistributedConfig):
    """jax.distributed wiring (SURVEY §2.10): must run before first backend
    use. On TPU pods the no-arg form autodetects; CPU/GPU clusters pass
    coordinator/num_processes/process_id explicitly."""
    import jax

    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes is not None:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id is not None:
        kwargs["process_id"] = cfg.process_id
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def train(cfg: RunConfig):
    # graceful preemption: install handlers FIRST — a SIGTERM landing during
    # backend init or the minutes-long compile window must not kill the
    # process; the first signal finishes the in-flight step (if any),
    # checkpoints, and exits cleanly (SLURM/TPU-pod preemption contract); a
    # second signal falls through to the previous handler
    import signal
    stop_requested = threading.Event()
    prev_handlers = {}

    def _on_signal(signum, frame):
        logger.warning("signal %d: checkpointing after the current step", signum)
        stop_requested.set()
        signal.signal(signum, prev_handlers.get(signum, signal.SIG_DFL))

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # not the main thread (in-process tests)
            break

    if cfg.distributed.enabled:
        _init_distributed(cfg.distributed)
    import jax
    from mdt_policy_tpu.agents import init_agent as init_mdtv, train_step
    from mdt_policy_tpu.agents.mdt_agent import init_agent as init_mdt
    from mdt_policy_tpu.agents.mdtv_agent import validation_step
    from mdt_policy_tpu.data.loader import DevicePrefetcher, Preprocessor
    from mdt_policy_tpu.parallel import make_mesh, replicate_tree, shard_batch
    from mdt_policy_tpu.utils.checkpoint import Checkpointer, latest_checkpoint
    from mdt_policy_tpu.utils.logging_utils import MetricsLogger

    # cache-mode checks/defaults must land BEFORE the config snapshot below,
    # so evaluation re-hydrates exactly the agent config that trained
    if cfg.data.use_extracted_embeddings and cfg.agent != "mdtv":
        raise ValueError(
            "data.use_extracted_embeddings requires agent=mdtv: only its "
            "camera towers are frozen constants whose outputs can be cached "
            "(the mdt agent TRAINS its ResNet encoders)")
    if cfg.data.use_extracted_embeddings:
        # numerics-identical perf defaults for the cache-mode step (see
        # CACHE_MODE_AGENT_DEFAULTS); explicit agent_overrides entries win
        for field, value in CACHE_MODE_AGENT_DEFAULTS.items():
            if field not in cfg.agent_overrides:
                cfg.agent_overrides[field] = value
                logger.info("embedding-cache mode: %s defaulted to %r",
                            field, value)

    run_name = cfg.run_name or time.strftime("%Y-%m-%d_%H-%M-%S")
    run_dir = Path(cfg.log_dir) / run_name
    is_lead = jax.process_index() == 0
    mlog = MetricsLogger(run_dir, config=dataclasses.asdict(cfg)) if is_lead \
        else _NullLogger()
    # snapshot the full run config: the run dir is the source of truth that
    # evaluation re-hydrates (the reference's .hydra/config.yaml contract,
    # evaluation/utils.py:159-163); lead process only in multi-host
    if is_lead:
        import yaml as _yaml
        run_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "config.yaml").write_text(
            _yaml.safe_dump(dataclasses.asdict(cfg)))
        _write_system_info(run_dir)
    logger.info("run dir: %s | %d devices (%d local)", run_dir,
                jax.device_count(), jax.local_device_count())

    agent_cfg = _make_agent(cfg)
    # per-host data rng (each host feeds its own slice of the global batch);
    # the MODEL rng stays host-independent so init is identical everywhere
    np_rng = np.random.default_rng(cfg.trainer.seed + jax.process_index())
    # All per-step keys are fold_in(base, step) — never a running split — so
    # a resumed run draws bit-identical noise/augmentation streams from any
    # checkpoint (deterministic preemption recovery; the reference's
    # Lightning auto-resume replays neither data order nor rng).
    k_init, k_prefetch, k_step_base, k_val_base = jax.random.split(
        jax.random.PRNGKey(cfg.trainer.seed), 4)

    # resume point must be known BEFORE the loaders exist: the data stream
    # fast-forwards to exactly the batch the preempted run would see next
    checkpointing = cfg.trainer.keep_checkpoints > 0
    resume_step, resuming = 0, False
    if checkpointing:
        last = latest_checkpoint(run_dir / "checkpoints")
        if last is not None:
            resume_step, resuming = int(last.name), True

    synthetic = cfg.data.root_data_dir is None
    val_iter = None
    if synthetic:
        logger.warning("no root_data_dir configured: SYNTHETIC data mode")
        loader = None
        raw_batch = _synthetic_batch(np_rng, cfg.trainer.batch_size, cfg.data,
                                     agent_cfg)
    else:
        loader = _real_loaders(cfg, "training", agent_cfg.clip_context_length,
                               agent_cfg.clip_vocab_size, start_batch=resume_step)
        raw_batch = next(iter(loader))
        val_root = Path(cfg.data.root_data_dir) / "validation"
        if val_root.exists():
            # resume replays the validation stream too: by step s the run has
            # consumed limit_val_batches per completed epoch
            val_consumed = (resume_step // cfg.trainer.steps_per_epoch
                            * cfg.trainer.limit_val_batches)
            val_loader = _real_loaders(cfg, "validation", agent_cfg.clip_context_length,
                                       agent_cfg.clip_vocab_size,
                                       start_batch=val_consumed)
            val_iter = iter(val_loader)

    import math as _math
    n_dev = len(jax.devices())
    global_batch = cfg.trainer.batch_size * jax.process_count()
    if jax.process_count() > 1:
        # multi-host: the mesh spans every device; per-host batches must
        # tile the device grid exactly
        if global_batch % n_dev != 0:
            raise ValueError(
                f"global batch {global_batch} (= {cfg.trainer.batch_size}/host"
                f" x {jax.process_count()} hosts) not divisible by "
                f"{n_dev} devices")
        n_use = n_dev
    elif cfg.trainer.devices is not None:
        n_use = cfg.trainer.devices
        if n_use > n_dev:
            raise ValueError(f"trainer.devices={n_use} but only {n_dev} present")
        if cfg.trainer.batch_size % n_use != 0:
            raise ValueError(
                f"batch_size {cfg.trainer.batch_size} not divisible by "
                f"trainer.devices={n_use}")
    else:
        n_use = _math.gcd(cfg.trainer.batch_size, n_dev)
        if n_use < n_dev:
            logger.warning("batch %d not divisible by %d devices; using %d "
                           "(set trainer.devices to make this an error)",
                           cfg.trainer.batch_size, n_dev, n_use)
    mesh = make_mesh(jax.devices()[:n_use])

    pp = Preprocessor(static_size=agent_cfg.img_size,
                      gripper_size=min(84, agent_cfg.img_size),
                      gen_size=agent_cfg.gen_img_res)

    def device_batch(key, raw):
        """Shard the raw uint8 host batch over the data axis (4x less PCIe
        than post-cast f32), then preprocess jitted — outputs inherit the
        sharding, no second device_put (round-1 did pp -> device_put again)."""
        out = {}
        for i, scope in enumerate(sorted(raw.keys())):
            arrays = {k: v for k, v in raw[scope].items()
                      if not isinstance(v, list)
                      and getattr(v, "dtype", None) != object}
            sharded = shard_batch(arrays, mesh)
            out[scope] = pp.train_batch(jax.random.fold_in(key, i), sharded)
        return out

    batch = device_batch(jax.random.fold_in(k_prefetch, resume_step), raw_batch)

    init = init_mdtv if cfg.agent == "mdtv" else init_mdt
    net, state = init(agent_cfg, k_init, batch["lang"])

    if cfg.trainer.pretrain_checkpoint and not resuming:
        from mdt_policy_tpu.models.layer_stack import convert_tower_layout
        from mdt_policy_tpu.utils.misc import initialize_pretrained_weights
        pre = _load_pretrain_params(cfg.trainer.pretrain_checkpoint)
        # warm starts work across tower layouts: convert the loaded tree to
        # this run's layout (no-op when they already match)
        pre = convert_tower_layout(
            pre, to_scan=bool(getattr(agent_cfg, "scan_tower_layers", False)))
        # ema gets independent copies: shared leaves between params and
        # ema_params would be the SAME buffer donated twice in the train step
        pre_ema = jax.tree_util.tree_map(np.array, pre)
        state = state.replace(
            params=initialize_pretrained_weights(state.params, pre),
            ema_params=initialize_pretrained_weights(state.ema_params, pre_ema))
        logger.info("warm-started from %s", cfg.trainer.pretrain_checkpoint)

    state = state.replace(params=replicate_tree(state.params, mesh),
                          ema_params=replicate_tree(state.ema_params, mesh),
                          opt_state=replicate_tree(state.opt_state, mesh))

    # keep_checkpoints=0 disables checkpointing (e.g. throwaway multi-host
    # smoke runs); orbax otherwise coordinates multi-process saves itself
    ckpt = Checkpointer(run_dir / "checkpoints",
                        keep=cfg.trainer.keep_checkpoints) if checkpointing else None
    if resuming:  # not `resume_step > 0`: a step-0 checkpoint (e.g. a
        # converted reference checkpoint dropped into the run dir) counts
        state = ckpt.restore(state)
        logger.info("auto-resumed from step %d", int(state.step))

    # validation_step is variant-agnostic: it drives the uniform
    # perceive/encode_*/gen_img_* protocol both agent nets implement (the
    # reference defines validation_step on the BASE agent for the same
    # reason, mdt/models/mdt_agent.py:281-357)
    jitted_step = jax.jit(partial(train_step, net), donate_argnums=(0,))
    jitted_val = jax.jit(partial(validation_step, net))
    from mdt_policy_tpu.agents.mdtv_agent import reconstruction_forward
    jitted_recon = jax.jit(partial(reconstruction_forward, net))
    if cfg.trainer.aot_step_cache:
        # eager AOT compile of the step program with a serialized-executable
        # cache: a preemption restart skips the compile service (see
        # utils/aot_cache.py). The example args pin the avals/shardings
        # every loop iteration reuses (batch from the prefetcher has the
        # device_batch spec; the key is a fold_in of the same base key).
        from mdt_policy_tpu.utils.aot_cache import compile_with_cache
        aot_dir = Path(cfg.trainer.aot_step_cache)
        if str(aot_dir) == "auto":
            aot_dir = run_dir / "aot_cache"
        elif not aot_dir.is_absolute():
            aot_dir = run_dir / aot_dir
        jitted_step, _aot_status = compile_with_cache(
            jitted_step, (state, batch, jax.random.fold_in(k_step_base, 0)),
            aot_dir, tag="train_step",
            extra_key=repr((agent_cfg, cfg.trainer.batch_size, n_use)))
        logger.info("aot_step_cache: %s (%s)", _aot_status, aot_dir)

    # 3-stage pipeline: loader threads decode ahead, the prefetcher thread
    # shards+preprocesses on device ahead, the main thread only steps —
    # host decode and H2D DMA overlap the chip's compute. The init batch is
    # already on device: preload it (don't re-transfer its raw form) and
    # start the raw stream at the NEXT index.
    import itertools
    raw_iter = iter(loader) if loader is not None \
        else itertools.repeat(raw_batch)
    prefetcher = DevicePrefetcher(raw_iter, device_batch, k_prefetch, depth=2,
                                  start_index=resume_step + 1,
                                  preloaded=(batch,))

    profile_range = None
    profiling_active = False
    if cfg.trainer.profile_steps:
        lo, _, hi = str(cfg.trainer.profile_steps).partition(":")
        if not hi:
            raise ValueError(f"trainer.profile_steps={cfg.trainer.profile_steps!r}"
                             " must be 'START:STOP' (quote it in YAML)")
        profile_range = (int(lo), int(hi))
        if profile_range[1] <= profile_range[0]:
            raise ValueError(f"trainer.profile_steps={cfg.trainer.profile_steps!r}"
                             " must be START:STOP with STOP > START")

    total_steps = cfg.trainer.max_epochs * cfg.trainer.steps_per_epoch
    t_last = time.perf_counter()
    try:
      while int(state.step) < total_steps:
        step = int(state.step)
        # >= not ==: a resume landing inside (or past the start of) the
        # range still traces the remaining steps
        if (profile_range is not None and not profiling_active
                and profile_range[0] <= step < profile_range[1]):
            import jax.profiler
            (run_dir / "profile").mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(run_dir / "profile"))
            profiling_active = True
        batch = next(prefetcher)
        k_step = jax.random.fold_in(k_step_base, step)
        state, metrics = jitted_step(state, batch, k_step)
        if profiling_active and step + 1 >= profile_range[1]:
            jax.block_until_ready(state.params)
            import jax.profiler
            jax.profiler.stop_trace()
            profile_range, profiling_active = None, False
            logger.info("profiler trace written to %s", run_dir / "profile")

        if (step + 1) % cfg.trainer.log_every == 0:
            dt = (time.perf_counter() - t_last) / cfg.trainer.log_every
            t_last = time.perf_counter()
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            metrics["perf/steps_per_sec"] = 1.0 / dt
            metrics["perf/chunks_per_sec"] = (
                2 * cfg.trainer.batch_size * jax.process_count() / dt)
            mlog.log(metrics, step + 1)
            logger.info("step %d | loss %.4f | %.1f chunks/s", step + 1,
                        metrics["train/total_loss"], metrics["perf/chunks_per_sec"])
            if cfg.trainer.halt_on_nonfinite and not np.isfinite(
                    metrics["train/total_loss"]):
                # divergence guard (failure detection the reference lacks,
                # SURVEY §5): piggybacks on the log-point metric fetch — no
                # extra per-step host sync. The poisoned state is NOT
                # checkpointed; resume restores the last good epoch save.
                raise TrainingDivergedError(
                    f"non-finite loss {metrics['train/total_loss']} at step "
                    f"{step + 1}; last checkpoint precedes this step — "
                    "lower the lr or inspect the data shard")

        if (step + 1) % cfg.trainer.steps_per_epoch == 0:
            epoch = (step + 1) // cfg.trainer.steps_per_epoch
            if cfg.rollout.enabled:
                rollout_metrics = _maybe_rollout(cfg, net, state, epoch)
                if rollout_metrics:
                    mlog.log(rollout_metrics, step + 1)
                    if checkpointing:
                        ckpt.save(state,
                                  metric=rollout_metrics["eval_lh/avg_seq_len"])
            if cfg.task_rollout.enabled:
                task_metrics = _maybe_task_rollout(cfg, net, state, epoch,
                                                   run_dir)
                if task_metrics:
                    mlog.log(task_metrics, step + 1)
            if jitted_val is not None:
                # validate on the validation split when available (the
                # reference's limit_val_batches=4 on EMA weights); synthetic
                # mode reuses the current train batch as a smoke check
                val_metrics: Dict[str, float] = {}
                first_vbatch = None
                for vb in range(cfg.trainer.limit_val_batches):
                    k_v, k_vp = jax.random.split(
                        jax.random.fold_in(k_val_base,
                                           step * cfg.trainer.limit_val_batches + vb))
                    if val_iter is not None:
                        vbatch = device_batch(k_vp, next(val_iter))
                    else:
                        vbatch = batch
                    if first_vbatch is None:
                        first_vbatch = vbatch
                    vm = jitted_val(state.ema_params, vbatch, k_v)
                    for k, v in jax.device_get(vm).items():
                        val_metrics[k] = val_metrics.get(k, 0.0) + float(v)
                val_metrics = {k: v / cfg.trainer.limit_val_batches
                               for k, v in val_metrics.items()}
                mlog.log(val_metrics, step + 1)
                if cfg.trainer.log_recon_images and is_lead:
                    _log_recon_images(cfg, agent_cfg, jitted_recon, state,
                                      first_vbatch, run_dir, mlog, step + 1,
                                      jax.random.fold_in(k_val_base,
                                                         2**20 + step))
            if checkpointing:
                ckpt.save(state)
                logger.info("epoch %d checkpointed at step %d",
                            (step + 1) // cfg.trainer.steps_per_epoch, step + 1)

        if stop_requested.is_set():
            if checkpointing:
                ckpt.save(state, wait=True)  # must be durable before exit
                logger.warning("preemption checkpoint saved at step %d; "
                               "resume by rerunning with the same run_name",
                               int(state.step))
            break
    finally:
        # an exception mid-loop must not leak signal handlers, profiler
        # state, or the prefetch/loader threads into the caller's process
        if profiling_active:
            import jax.profiler
            jax.profiler.stop_trace()
        if checkpointing:
            ckpt.wait()  # settle any in-flight async save before returning
        for sig, h in prev_handlers.items():
            try:
                signal.signal(sig, h)
            except ValueError:
                break
        prefetcher.close()
        if loader is not None:
            loader.close()
        mlog.finish()
    return state


def _write_system_info(run_dir: Path):
    """Software/hardware snapshot into <run_dir>/system_info.json — the
    reference's startup system-info dump (mdt/training.py:58,
    mdt/utils/utils.py:91-137: print_system_env_info). Best-effort."""
    import json
    import platform
    import socket

    try:
        import jax
        from collections import Counter
        info = {
            "python": platform.python_version(),
            "platform": platform.platform(),
            "hostname": socket.gethostname(),
            "jax": jax.__version__,
            "backend": jax.default_backend(),
            "devices": dict(Counter(d.device_kind for d in jax.devices())),
            "process_count": jax.process_count(),
        }
        for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
            try:
                import importlib
                info[mod] = importlib.import_module(mod).__version__
            except Exception:
                pass
        (run_dir / "system_info.json").write_text(json.dumps(info, indent=2))
    except Exception as e:
        logger.warning("system info dump skipped: %s", e)


def _log_recon_images(cfg: RunConfig, agent_cfg, jitted_recon, state, vbatch,
                      run_dir: Path, mlog, step: int, rng):
    """Save one masked-foresight reconstruction grid (first validation batch,
    lang scope) under <run_dir>/media and register it with wandb — the
    reference's store_img validation branch + wandb.Image log
    (mdt/models/mdt_agent.py:398-417). Best-effort: a broken PIL or a batch
    without gen targets degrades to a warning, never kills the run."""
    try:
        from mdt_policy_tpu.models.masked_decoder import (
            MaskedTransformerImgDecoder, reconstruct_images)
        scope = "lang" if "lang" in vbatch else sorted(vbatch)[0]
        b = vbatch[scope]
        if "gen_static" not in b:
            return
        goal_imgs, recon, mask = jitted_recon(state.ema_params, b, rng)
        # unbound decoder: reconstruct_images only uses its pure patch-math
        # attributes (patchify/patch_size/resolution), never params
        dec = MaskedTransformerImgDecoder(
            resolution=agent_cfg.gen_img_res,
            patch_size=agent_cfg.gen_patch_size,
            decoder_depth=agent_cfg.gen_decoder_depth,
            decoder_embed_dim=agent_cfg.gen_decoder_dim,
            decoder_n_heads=agent_cfg.gen_decoder_heads,
            context_dim=agent_cfg.latent_dim,
            mask_ratio=agent_cfg.gen_mask_ratio)
        media = run_dir / "media"
        media.mkdir(parents=True, exist_ok=True)
        path = media / f"img_gen_pred_step{step}.png"
        reconstruct_images(dec, recon, goal_imgs, mask, file_path=path)
        mlog.log_image("generated_img", path, step)
    except Exception as e:
        logger.warning("recon image logging skipped: %s", e)


def _maybe_rollout(cfg: RunConfig, net, state, epoch: int):
    """Training-time long-horizon CALVIN rollout (RolloutLongHorizon
    equivalent). Uses the EMA weights like the reference's
    evaluate_ema_weights_instead (ema.py:182-211). Requires calvin_env."""
    from mdt_policy_tpu.evaluation.training_callbacks import RolloutLongHorizonCallback
    if not (epoch > cfg.rollout.skip_epochs
            and (epoch - cfg.rollout.skip_epochs) % cfg.rollout.rollout_freq == 0):
        return None
    # a mis-configured rollout must degrade to a warning, not kill the
    # training run mid-epoch (env construction touches external calvin_env)
    try:
        from mdt_policy_tpu.evaluation.annotations import make_task_oracle
        from mdt_policy_tpu.evaluation.env_adapter import make_calvin_env
        env = make_calvin_env(cfg.rollout.val_dataset_path)
        oracle = make_task_oracle()
    except Exception as e:
        logger.warning("rollout skipped (env/oracle unavailable): %s", e)
        return None
    from mdt_policy_tpu.evaluation.annotations import make_goal_fn
    from mdt_policy_tpu.evaluation.policy_adapter import make_rollout_policy
    policy = make_rollout_policy(net, state.ema_params)
    # reference evaluates with the per-task VALIDATION sentence
    # (rollout_long_horizon.py:129-138), never synthesized task-name text
    goal_fn = make_goal_fn(net.cfg.clip_context_length)

    cb = RolloutLongHorizonCallback(
        env, oracle, goal_fn, num_sequences=cfg.rollout.num_sequences,
        ep_len=cfg.rollout.ep_len, rollout_freq=cfg.rollout.rollout_freq,
        skip_epochs=cfg.rollout.skip_epochs)
    return cb(policy, epoch)


def _resolve_target(path: str):
    """Dotted-path import (the hydra `_target_` equivalent)."""
    import importlib
    mod, _, fn = path.rpartition(".")
    return getattr(importlib.import_module(mod), fn)


def _maybe_task_rollout(cfg: RunConfig, net, state, epoch: int, run_dir: Path):
    """Validation-time single-task rollouts (the reference `Rollout` callback,
    mdt/rollout/rollout.py:58-118): first eligible epoch discovers solvable
    demos from validation batches (env reset to first/last window state +
    oracle, ref :374-421), persists the task dictionary beside the
    checkpoints (ref :404-415 stores it in the ckpt), later epochs reuse it;
    every eligible epoch logs `tasks/{task}_sr` per goal modality."""
    tr = cfg.task_rollout
    if not (epoch > tr.skip_epochs
            and (epoch - tr.skip_epochs) % tr.rollout_freq == 0):
        return None
    try:
        env = _resolve_target(tr.env_target)(tr.val_dataset_path)
        oracle = _resolve_target(tr.oracle_target)()
    except Exception as e:
        logger.warning("task rollout skipped (env/oracle unavailable): %s", e)
        return None

    from mdt_policy_tpu.evaluation.annotations import make_goal_fn
    from mdt_policy_tpu.evaluation.policy_adapter import make_rollout_policy
    from mdt_policy_tpu.evaluation.single_task_rollout import (
        SingleTaskRollout, discover_tasks, load_task_dict,
        save_task_dict, state_pairs_from_batch)

    task_dict_path = run_dir / "task_dict.npy"
    if task_dict_path.exists():
        task_to_states = load_task_dict(task_dict_path)
    else:
        if cfg.data.root_data_dir is None:
            logger.warning("task rollout skipped: discovery needs a real "
                           "validation split (data.root_data_dir unset)")
            return None
        # discovery pulls raw host batches (robot_obs + scene_obs) from a
        # dedicated validation loader so the training/validation streams'
        # determinism is untouched
        agent_cfg = net.cfg
        disc = _real_loaders(cfg, "validation", agent_cfg.clip_context_length,
                             agent_cfg.clip_vocab_size, include_scene_obs=True)
        try:
            it = iter(disc)
            pairs = []
            for _ in range(tr.discovery_batches):
                pairs += state_pairs_from_batch(next(it)["vis"])
        finally:
            disc.close()
        task_to_ids = discover_tasks(env, oracle, pairs)
        task_to_states = {t: [pairs[i] for i in ids]
                          for t, ids in task_to_ids.items()}
        save_task_dict(task_dict_path, task_to_states)
        logger.info("task discovery: %s",
                    {t: len(v) for t, v in task_to_states.items()})
    if not task_to_states:
        logger.warning("task rollout: no solvable tasks discovered")
        return None

    policy = make_rollout_policy(net, state.ema_params)
    goal_fn = make_goal_fn(net.cfg.clip_context_length)
    cb = SingleTaskRollout(
        env, oracle, goal_fn, ep_len=tr.ep_len,
        rollouts_per_task=tr.rollouts_per_task,
        id_selection_strategy=tr.id_selection_strategy,
        min_window_size=cfg.data.min_window_size,
        max_window_size=cfg.data.max_window_size,
        modalities=tuple(tr.modalities))
    return cb(policy, task_to_states)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    cfg = load_config(args.config, args.overrides)
    train(cfg)


if __name__ == "__main__":
    main()
