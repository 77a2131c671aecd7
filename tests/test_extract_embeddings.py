"""Offline frozen-tower embedding cache (data/extract_embeddings.py):
extraction, dataset/loader plumbing, loss parity vs the in-program tower
path, and the training CLI running end-to-end without ever executing the
camera towers."""

from pathlib import Path

import numpy as np
import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

from test_train_real_data import _write_split
from test_training_cli import TINY_OVERRIDES


def _tiny_agent(batch_size=2):
    import jax
    from mdt_policy_tpu.agents import MDTVConfig, init_agent

    cfg = MDTVConfig(**TINY_OVERRIDES)
    rng = np.random.default_rng(0)
    example = {
        "rgb_static": np.zeros((batch_size, 2, 32, 32, 3), np.float32),
        "rgb_gripper": np.zeros((batch_size, 2, 32, 32, 3), np.float32),
        "gen_static": np.zeros((batch_size, 32, 32, 3), np.float32),
        "gen_gripper": np.zeros((batch_size, 32, 32, 3), np.float32),
        "actions": rng.normal(size=(batch_size, 10, 7)).astype(np.float32),
        "lang_tokens": np.zeros((batch_size, cfg.clip_context_length), np.int32),
    }
    net, state = init_agent(cfg, jax.random.PRNGKey(0), example)
    return net, state.params


def test_extract_and_loss_parity(tmp_path):
    """Cached voltron_tokens/image_latent_goal reproduce the in-program
    frozen-tower losses: same sample, same rngs, eval preprocessing on the
    rgb path (= what extraction saw), losses match."""
    import jax
    import ml_dtypes

    from mdt_policy_tpu.data import CalvinDataset
    from mdt_policy_tpu.data.extract_embeddings import extract_embeddings
    from mdt_policy_tpu.data.loader import Preprocessor, collate

    rng = np.random.default_rng(3)
    split = tmp_path / "calvin" / "validation"  # deterministic windows
    _write_split(split, 40, rng)

    net, params = _tiny_agent()
    out = extract_embeddings(split, net, params, batch_size=2)
    tok = np.load(out / "ep_voltron_tokens.npy")
    emb = np.load(out / "ep_clip_img_emb.npy")
    assert tok.dtype == np.uint16 and tok.shape[0] == 40
    # tiny config: 32px/16 ViT -> 4 tokens per camera, 2 cameras, D=32
    assert tok.shape[1:] == (8, 32)
    assert emb.dtype == np.float32 and emb.shape == (40, 16)
    assert (out / "embeddings_meta.json").exists()

    kw = dict(key="vis", min_window_size=21, max_window_size=30,
              use_extracted_frames=False)
    ds_emb = CalvinDataset(split, use_extracted_embeddings=True, **kw)
    ds_rgb = CalvinDataset(split, **kw)

    s_emb = collate([ds_emb[0], ds_emb[1]])
    s_rgb = collate([ds_rgb[0], ds_rgb[1]])
    assert "rgb_static" not in s_emb
    assert s_emb["voltron_tokens"].dtype == ml_dtypes.bfloat16
    # row alignment: the sample's obs-frame tokens are the cached rows
    np.testing.assert_array_equal(
        s_emb["voltron_tokens"].view(np.uint16), tok[[0, 1]])

    pp = Preprocessor(static_size=32, gripper_size=32, gen_size=32)
    b_emb = jax.device_get(pp.eval_batch(s_emb))
    b_rgb = jax.device_get(pp.eval_batch(s_rgb))
    np.testing.assert_array_equal(b_emb["gen_static"], b_rgb["gen_static"])

    rngs = dict(zip(("dropout", "sigma", "noise", "mask", "goal_mask"),
                    jax.random.split(jax.random.PRNGKey(7), 5)))
    out_rgb = net.apply({"params": params}, b_rgb, modality="vis",
                        train=False, rngs=rngs)
    out_emb = net.apply({"params": params}, b_emb, modality="vis",
                        train=False, rngs=rngs)
    for k in out_rgb:
        np.testing.assert_allclose(np.asarray(out_emb[k]),
                                   np.asarray(out_rgb[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)


def test_aug_variant_parity_and_dataset(tmp_path):
    """DrQ-augmented cache variants (--aug-variants): the stored rows are
    bit-exactly what the in-program full-mode sequence (resize -> RandomShift
    with the same key -> CLIP-normalize -> frozen towers) produces, and the
    cache-mode dataset samples one cached variant per draw."""
    import jax
    import ml_dtypes

    from mdt_policy_tpu.data import CalvinDataset
    from mdt_policy_tpu.data.extract import extract_frames
    from mdt_policy_tpu.data.extract_embeddings import extract_embeddings
    from mdt_policy_tpu.data.transforms import preprocess_rgb_train

    rng = np.random.default_rng(8)
    split = tmp_path / "calvin" / "training"
    _write_split(split, 40, rng)
    extract_frames(split)

    net, params = _tiny_agent()
    K = 2
    out = extract_embeddings(split, net, params, batch_size=8,
                             aug_variants=K, aug_seed=5)
    aug_tok = np.load(out / "ep_voltron_tokens_aug.npy")
    aug_emb = np.load(out / "ep_clip_img_emb_aug.npy")
    assert aug_tok.shape == (40, K, 8, 32) and aug_tok.dtype == np.uint16
    assert aug_emb.shape == (40, K, 16) and aug_emb.dtype == np.float32
    import json
    meta = json.loads((out / "embeddings_meta.json").read_text())
    assert meta["aug_variants"] == K and meta["aug_seed"] == 5

    # --- fixed-shift parity vs the in-program aug+tower path: recompute one
    # (variant, batch) block with an INDEPENDENT composition of the
    # production train pipeline + towers (the exact sequence
    # loader.Preprocessor._train_impl feeds the full-mode step) ---
    ex_frames = {k: np.load(out / f"ep_{k}.npy", mmap_mode="r")
                 for k in ("rgb_static", "rgb_gripper")}
    k_var, lo = 1, 8
    rows = np.arange(lo, lo + 8)
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(5), k_var), lo)

    @jax.jit
    def inprogram(static_u8, gripper_u8, key):
        k1, k2 = jax.random.split(key)
        s = preprocess_rgb_train(k1, static_u8, size=32, shift_pad=10)
        g = preprocess_rgb_train(k2, gripper_u8, size=32, shift_pad=4)
        tok = net.apply({"params": params}, s, g,
                        method="voltron_camera_tokens")
        emb = net.apply({"params": params}, s, method="encode_visual_goal")
        return tok, emb

    tok_ref, emb_ref = jax.device_get(inprogram(
        np.asarray(ex_frames["rgb_static"][rows]),
        np.asarray(ex_frames["rgb_gripper"][rows]), key))
    np.testing.assert_array_equal(aug_tok[rows, k_var],
                                  tok_ref.view(np.uint16))
    np.testing.assert_array_equal(aug_emb[rows, k_var], emb_ref)

    # --- dataset: every training draw serves one of the K cached variants;
    # the clean (eval-pipeline) rows are NOT served when aug is on ---
    clean_tok = np.load(out / "ep_voltron_tokens.npy")
    kw = dict(key="vis", min_window_size=21, max_window_size=30,
              use_extracted_embeddings=True, embedding_aug_variants=K)
    ds = CalvinDataset(split, **kw)
    assert ds.aug_variants == K
    seen = set()
    for i in (0, 1, 2, 0, 0, 0):
        s = ds[i]
        row = int(ds.ex_name_to_idx[int(ds.episode_lookup[i])])
        bits = s["voltron_tokens"].view(np.uint16)
        matches = [k for k in range(K)
                   if np.array_equal(bits, aug_tok[row, k])]
        assert len(matches) == 1, "sample must be exactly one cached variant"
        assert not np.array_equal(bits, clean_tok[row])
        seen.update(matches)
    assert len(seen) == K, "both variants should appear across draws"

    # vectorized batch path serves variants too, consistently per sample
    fast = ds.get_batch(np.array([0, 1, 2, 3]))
    for b in range(4):
        row = int(ds.ex_name_to_idx[int(ds.episode_lookup[b])])
        bits = fast["voltron_tokens"][b].view(np.uint16)
        assert any(np.array_equal(bits, aug_tok[row, k]) for k in range(K))

    # validation datasets ignore the flag (clean embeddings, no aug)
    val_split = tmp_path / "calvin" / "validation"
    _write_split(val_split, 40, np.random.default_rng(9))
    extract_frames(val_split)
    extract_embeddings(val_split, net, params, batch_size=8)
    ds_val = CalvinDataset(val_split, **kw)
    assert ds_val.aug_variants == 0


def test_vectorized_batch_matches_items(tmp_path):
    """get_batch fast path emits the same embedding rows as __getitem__."""
    from mdt_policy_tpu.data import CalvinDataset
    from mdt_policy_tpu.data.extract import extract_frames
    from mdt_policy_tpu.data.extract_embeddings import extract_embeddings
    from mdt_policy_tpu.data.loader import collate

    rng = np.random.default_rng(4)
    split = tmp_path / "calvin" / "validation"
    _write_split(split, 40, rng)
    extract_frames(split)

    net, params = _tiny_agent()
    extract_embeddings(split, net, params, batch_size=8)

    kw = dict(key="vis", min_window_size=21, max_window_size=30,
              use_extracted_embeddings=True)
    ds = CalvinDataset(split, **kw)
    idxs = np.array([0, 3, 5])
    fast = ds.get_batch(idxs)
    assert fast is not None
    slow = collate([CalvinDataset(split, **kw)[int(i)] for i in idxs])
    np.testing.assert_array_equal(fast["voltron_tokens"].view(np.uint16),
                                  slow["voltron_tokens"].view(np.uint16))
    np.testing.assert_array_equal(fast["image_latent_goal"],
                                  slow["image_latent_goal"])
    np.testing.assert_array_equal(fast["gen_static"], slow["gen_static"])
    np.testing.assert_array_equal(fast["actions"], slow["actions"])


def test_training_cli_with_extracted_embeddings(tmp_path):
    """End-to-end: train a seed run, extract embeddings from its towers via
    the CLI, then train from the cache — validation metrics included —
    without the camera towers ever running in the step."""
    pytest.importorskip("regex")
    try:
        from mdt_policy_tpu.utils.clip_tokenizer import default_bpe_path
        default_bpe_path()
    except FileNotFoundError:
        pytest.skip("BPE vocab not available")

    rng = np.random.default_rng(5)
    data_root = tmp_path / "calvin"
    _write_split(data_root / "training", 60, rng)
    _write_split(data_root / "validation", 40, rng)

    from mdt_policy_tpu.training import (DataConfig, RunConfig, TrainerConfig,
                                         train)

    overrides = dict(TINY_OVERRIDES)
    overrides.update(clip_vocab_size=49408, clip_context_length=16)
    seed_cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path / "runs"), run_name="seed",
        data=DataConfig(root_data_dir=str(data_root), min_window_size=21,
                        max_window_size=30),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1),
        agent_overrides=overrides,
    )
    train(seed_cfg)
    run_dir = tmp_path / "runs" / "seed"

    from mdt_policy_tpu.data.extract_embeddings import main as extract_main
    for split in ("training", "validation"):
        # training split also caches 2 DrQ-shift variants per frame
        aug = ["--aug-variants", "2"] if split == "training" else []
        extract_main(["-i", str(data_root / split),
                      "--train-folder", str(run_dir), "--batch-size", "16",
                      *aug])
        assert (data_root / split / "extracted"
                / "ep_voltron_tokens.npy").exists()
        # the text-goal cache rides along (one row per annotation sentence)
        assert (data_root / split / "extracted"
                / "ep_lang_goal_emb.npy").exists()

    # lang datasets in cache mode emit the cached text goal per sample
    from mdt_policy_tpu.data import CalvinDataset
    ds = CalvinDataset(data_root / "training", key="lang",
                       min_window_size=21, max_window_size=30,
                       use_extracted_embeddings=True)
    s = ds[0]
    lang_emb_rows = np.load(data_root / "training" / "extracted"
                            / "ep_lang_goal_emb.npy")
    np.testing.assert_array_equal(
        s["lang_latent_goal"], lang_emb_rows[int(ds.lang_lookup[0])])

    # fresh run from the cache, towers warm-started from the seed run so the
    # cached embeddings stay coherent with the checkpointed tower weights
    emb_cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path / "runs"), run_name="fromcache",
        data=DataConfig(root_data_dir=str(data_root), min_window_size=21,
                        max_window_size=30, use_extracted_embeddings=True,
                        embedding_aug_variants=2),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=2,
                              limit_val_batches=1, seed=0, log_every=1,
                              pretrain_checkpoint=str(run_dir / "checkpoints")),
        agent_overrides=overrides,
    )
    state = train(emb_cfg)
    assert int(state.step) == 2
    csv = (tmp_path / "runs" / "fromcache" / "metrics.csv").read_text()
    assert "train/total_loss" in csv
    assert "val_act/action_loss" in csv


def test_learns_from_precomputed_batch():
    """The cache-mode train step actually LEARNS: with camera towers never
    executing, a constant-action precomputed batch is overfit (diffusion
    loss falls substantially) — the test_convergence guard for the
    use_extracted_embeddings path."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step

    cfg = MDTVConfig(**TINY_OVERRIDES)
    cfg = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(cfg.optimizer, learning_rate=1e-3),
        lr_scheduler=dataclasses.replace(cfg.lr_scheduler, total_steps=300),
        # the production cache-mode defaults (training.py): learning must
        # hold under the bf16 foresight decoder and without perceiver remat
        remat_perceiver=False, gen_compute_dtype="bfloat16")
    rng = np.random.default_rng(6)
    B = 2
    const = np.linspace(-1, 1, 70).reshape(1, 10, 7).astype(np.float32)

    def scope():
        return {
            "voltron_tokens": jnp.asarray(
                rng.normal(size=(B, 8, 32)).astype(ml_dtypes.bfloat16)),
            "image_latent_goal": jnp.asarray(
                rng.normal(size=(B, 16)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "actions": jnp.broadcast_to(jnp.asarray(const), (B, 10, 7)),
            "lang_tokens": jnp.asarray(
                rng.integers(1, cfg.clip_vocab_size,
                             size=(B, cfg.clip_context_length)), jnp.int32),
        }

    batch = {"vis": scope(), "lang": scope()}
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(250):
        state, metrics = jitted(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["lang/action_loss"]))
    early = float(np.mean(losses[:40]))
    late = float(np.mean(losses[-40:]))
    assert late < 0.75 * early, (early, late)


def test_sharded_cache_mode_step(eight_devices):
    """Cache-mode batches (bf16 voltron_tokens + f32 goal embeddings) shard
    over the 8-device data mesh and the full train step runs — the
    multi-chip path of data.use_extracted_embeddings."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from mdt_policy_tpu.parallel import make_mesh, replicate_tree, shard_batch

    cfg = MDTVConfig(**TINY_OVERRIDES)
    rng = np.random.default_rng(7)
    B = 8

    def scope():
        return {
            "voltron_tokens": rng.normal(size=(B, 8, 32)).astype(
                ml_dtypes.bfloat16),
            "image_latent_goal": rng.normal(size=(B, 16)).astype(np.float32),
            "gen_static": rng.uniform(size=(B, 32, 32, 3)).astype(np.float32),
            "gen_gripper": rng.uniform(size=(B, 32, 32, 3)).astype(np.float32),
            "actions": rng.normal(size=(B, 10, 7)).astype(np.float32),
            "lang_tokens": rng.integers(
                1, cfg.clip_vocab_size,
                size=(B, cfg.clip_context_length)).astype(np.int32),
        }

    raw = {"vis": scope(), "lang": scope()}
    net, state = init_agent(cfg, jax.random.PRNGKey(0), raw["lang"])
    mesh = make_mesh(eight_devices[:8])
    batch = {s: shard_batch(raw[s], mesh) for s in raw}
    state = state.replace(params=replicate_tree(state.params, mesh),
                          ema_params=replicate_tree(state.ema_params, mesh),
                          opt_state=replicate_tree(state.opt_state, mesh))
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/total_loss"]))
    assert np.isfinite(float(metrics["train/grad_norm"]))


def test_extracted_embeddings_rejects_mdt_agent(tmp_path):
    from mdt_policy_tpu.training import DataConfig, RunConfig, train

    cfg = RunConfig(agent="mdt",
                    data=DataConfig(use_extracted_embeddings=True),
                    log_dir=str(tmp_path))
    with pytest.raises(ValueError, match="mdtv"):
        train(cfg)
