"""Convergence A/B: full mode vs embedding-cache mode vs cache+aug-variants.

Round-4 VERDICT #2: cache-mode training (data.use_extracted_embeddings) was
benchmarked but its training FIDELITY was unquantified — the mode feeds the
trainable stack cached frozen-tower outputs (optionally with K cached
DrQ-shift variants per frame) instead of running the towers in-program, and
no A/B showed the recipes converge alike on the same data.

This tool runs the SAME on-disk dataset, seed, tiny agent and step budget
through three training configurations:

  full            in-program towers, on-device DrQ shift aug (the reference
                  recipe, mdt/utils/transforms.py:73-96)
  cache           offline embedding cache, clean eval-pipeline embeddings
                  (no aug — round-4's fast path)
  cache+variants  offline cache with K=2 DrQ-shift variants per frame
                  (extract_embeddings --aug-variants; round-5 fast path)

The dataset carries a learnable observation->action mapping (actions are a
deterministic function of the latent that also drives the frame pixels), so
the action-denoising loss has signal to converge on. The cache is extracted
with the full run's OWN frozen tower weights (identical init seed), so every
configuration optimizes the identical objective modulo the aug/cache seam.

Usage:  python tools/ab_convergence.py [--steps 300] [--out ab.json]
Prints a loss table; writes the curves as JSON for the round notes.
"""

from __future__ import annotations

import argparse
import csv
import json
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H = 32

TINY = dict(
    latent_dim=32, embed_dim=32, obs_dim=32, goal_dim=16, clip_embed_dim=16,
    n_enc_layers=1, n_dec_layers=1, n_heads=2,
    perceiver_dim=32, perceiver_depth=1, perceiver_heads=2, perceiver_dim_head=8,
    num_latents=3, img_size=32, vit_patch=16, vit_depth=1, vit_heads=2,
    clip_vision_width=32, clip_vision_layers=1, clip_vision_patch=16,
    clip_text_width=16, clip_text_layers=1, clip_text_heads=2,
    clip_context_length=16, clip_vocab_size=49408,
    gen_img_res=32, gen_patch_size=16, gen_decoder_depth=1, gen_decoder_dim=16,
    gen_decoder_heads=2, num_sampling_steps=2,
)


def write_split(root: Path, n_frames: int, seed: int):
    """CALVIN-format split with a LEARNABLE obs->action mapping: a slow
    latent drives both the frame brightness and the action vector."""
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True)
    np.save(root / "ep_start_end_ids.npy", np.array([[0, n_frames - 1]]))
    phases = rng.uniform(0, 2 * np.pi, 7)
    for i in range(n_frames):
        z = np.sin(i / 9.0)
        base = np.uint8(128 + 90 * z)
        noise = rng.integers(-20, 20, (H, H, 3))
        frame = np.clip(int(base) + noise, 0, 255).astype(np.uint8)
        actions = (0.8 * np.sin(i / 9.0 + phases)).astype(np.float32)
        np.savez(root / f"episode_{i:07d}.npz",
                 rgb_static=frame,
                 rgb_gripper=np.clip(255 - int(base) + noise, 0, 255
                                     ).astype(np.uint8),
                 robot_obs=np.zeros(15, np.float32),
                 scene_obs=np.zeros(24, np.float32),
                 rel_actions=actions)
    lang = {
        "info": {"indx": [(0, n_frames - 1)]},
        "language": {"emb": rng.normal(size=(1, 1, 384)).astype(np.float32),
                     "ann": ["open the drawer"]},
    }
    lang_dir = root / "lang_clip_resnet50"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy", lang, allow_pickle=True)

    from mdt_policy_tpu.data import extract_by_key
    from mdt_policy_tpu.data.extract import extract_frames
    extract_by_key(root, "rel_actions")
    extract_frames(root)


def read_curves(run_dir: Path):
    """(steps, train action loss, val action loss) columns of metrics.csv.
    The logger rewrites the header mid-file when the schema grows (val
    columns appear at the first epoch end), so headers are re-parsed on
    every row that starts with 'step'."""
    tr, va = [], []
    header = None
    for row in csv.reader(open(run_dir / "metrics.csv")):
        if row and row[0] == "step":
            header = row
            continue
        d = dict(zip(header, row))
        if d.get("lang/action_loss"):
            tr.append((int(d["step"]), float(d["lang/action_loss"])))
        if d.get("val_act/action_loss"):
            va.append((int(d["step"]), float(d["val_act/action_loss"])))
    return tr, va


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variants", type=int, default=2)
    ap.add_argument("--bf16-denoiser", action="store_true",
                    help="add a fourth arm: cache+variants with "
                         "denoiser_compute_dtype=bfloat16 (the AMP-16-"
                         "analogue perf option)")
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--keep", default=None,
                    help="keep the workdir at this path (default: tmp, removed)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    work = Path(args.keep) if args.keep else Path(
        tempfile.mkdtemp(prefix="mdt_ab_convergence_"))
    data_root = work / "calvin"
    try:
        write_split(data_root / "training", args.frames, args.seed)
        write_split(data_root / "validation", max(48, args.frames // 2),
                    args.seed + 1)

        from mdt_policy_tpu.training import (DataConfig, RunConfig,
                                             TrainerConfig, train)

        # log every ~20 steps; validate every steps/4
        epoch = max(20, args.steps // 4)
        n_epochs = max(1, args.steps // epoch)

        # schedule matched to the A/B's step budget: the production
        # tri-stage schedule (total_steps=50k, 1k warmup) would leave a
        # few-hundred-step run entirely inside warmup at a tiny lr —
        # nothing would separate the recipes
        overrides = dict(TINY)
        overrides["optimizer"] = {"learning_rate": 1e-3}
        overrides["lr_scheduler"] = {"init_lr": 1e-3,
                                     "total_steps": n_epochs * epoch}

        def run(name: str, agent_extra=None, **data_kw):
            cfg = RunConfig(
                agent="mdtv", log_dir=str(work / "runs"), run_name=name,
                data=DataConfig(root_data_dir=str(data_root),
                                min_window_size=21, max_window_size=30,
                                **data_kw),
                trainer=TrainerConfig(
                    batch_size=args.batch_size, max_epochs=n_epochs,
                    steps_per_epoch=epoch, limit_val_batches=2,
                    seed=args.seed, log_every=20, keep_checkpoints=1,
                    log_recon_images=False),
                agent_overrides={**overrides, **(agent_extra or {})},
            )
            print(f"=== training [{name}] {n_epochs * epoch} steps ===",
                  flush=True)
            train(cfg)
            return work / "runs" / name

        # A: the reference recipe — in-program towers + on-device DrQ aug
        full_dir = run("full")

        # extract the cache from the full run's OWN (frozen = init) towers
        from mdt_policy_tpu.data.extract_embeddings import (extract_embeddings,
                                                            extract_lang_goals)
        from mdt_policy_tpu.evaluate import load_run_agent
        net, params, _, _ = load_run_agent(full_dir, use_ema=False)
        for split in ("training", "validation"):
            extract_embeddings(data_root / split, net, params, batch_size=16,
                               aug_variants=args.variants, aug_seed=7,
                               source="ab_convergence")
            extract_lang_goals(data_root / split, net, params,
                               context_length=net.cfg.clip_context_length)

        # B: clean cache (round-4 fast path, no aug)
        cache_dir = run("cache", use_extracted_embeddings=True)
        # C: cache with K shift variants (round-5 fast path)
        var_dir = run("cache_variants", use_extracted_embeddings=True,
                      embedding_aug_variants=args.variants)
        arms = [("full", full_dir), ("cache", cache_dir),
                ("cache+variants", var_dir)]
        if args.bf16_denoiser:
            bf16_dir = run(
                "cache_variants_bf16", use_extracted_embeddings=True,
                embedding_aug_variants=args.variants,
                agent_extra={"denoiser_compute_dtype": "bfloat16"})
            arms.append(("cache+variants+bf16", bf16_dir))

        result = {}
        for name, d in arms:
            tr, va = read_curves(d)
            result[name] = {"train_action_loss": tr, "val_action_loss": va}

        print(f"\n{'step':>6} | " + " | ".join(f"{n:>16}" for n in result))
        steps = [s for s, _ in result["full"]["val_action_loss"]]
        for i, s in enumerate(steps):
            row = []
            for n in result:
                va = result[n]["val_action_loss"]
                row.append(f"{va[i][1]:16.4f}" if i < len(va) else " " * 16)
            print(f"{s:>6} | " + " | ".join(row) + "   (val action loss)")
        final = {n: result[n]["val_action_loss"][-1][1] for n in result}
        print("\nfinal val action loss:", json.dumps(final, indent=2))
        for n in result:
            tr = [x for _, x in result[n]["train_action_loss"]]
            assert tr[-1] < tr[0], f"{n}: train action loss did not decrease"
        if args.out:
            Path(args.out).write_text(json.dumps(
                {"config": vars(args), "curves": result, "final_val": final},
                indent=2))
            print(f"curves -> {args.out}")
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
