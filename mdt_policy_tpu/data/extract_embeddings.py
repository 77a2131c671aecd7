"""Offline frozen-tower embedding extraction — the reference's
`extract_by_key` preprocessing idiom (ref preprocess/extract_by_key.py:43-153)
applied to the FROZEN towers of MDT-V.

The frozen Voltron ViT and CLIP-vision towers are constants of the training
loss (the reference freezes them outright: voltron_encoder.py:85-87,
vision_clip.py:39-44) yet they execute ~60 of the ~75 TFLOP of every
production train step. Because they are per-frame pure functions of the raw
camera pixels, their outputs can be computed ONCE offline and cached beside
the dataset — exactly like the reference caches `rel_actions`. This CLI
sweeps a CALVIN split and writes, row-aligned with `ep_npz_names.list`:

  extracted/ep_voltron_tokens.npy  (N, 2*tokens, D) bfloat16, stored as the
                                   raw uint16 bit pattern (np has no bf16)
  extracted/ep_clip_img_emb.npy    (N, E) float32 CLIP image embeddings
  extracted/embeddings_meta.json   shapes/dtypes + source-run provenance

Training with `data.use_extracted_embeddings=true` then feeds these straight
into the perceiver / goal seam (agents/mdtv_agent.py `__call__` precomputed
branch) and the camera towers never run in the train step.

DrQ augmentation (`--aug-variants K`): the reference applies RandomShiftsAug
(pad 10 static / 4 gripper, ref mdt/utils/transforms.py:73-96 +
calvin_transforms.yaml:6-7,22-23) to every TRAINING frame before the towers.
Because the towers are frozen, an augmented frame's embedding is as cacheable
as the clean one — so extraction can bake the augmentation into the cache:
K additional variants per frame, each through resize -> random-shift (a
deterministic per-(variant, batch) key) -> normalize -> tower, stored as

  extracted/ep_voltron_tokens_aug.npy  (N, K, 2*tokens, D) bf16-as-uint16
  extracted/ep_clip_img_emb_aug.npy    (N, K, E) float32

The cache-mode dataset (CalvinDataset(embedding_aug_variants=K)) then samples
one variant per draw — stochastic shift augmentation restored to the fast
path, K discrete shifts per frame instead of the full (2*pad+1)^2 grid.
Parity of a fixed shift vs the in-program aug+tower path is tested in
tests/test_extract_embeddings.py.

Tradeoffs (opt-in, documented):
* with --aug-variants 0 (default) embeddings come from eval-preprocessed
  frames (resize + CLIP-normalize only) and training from the cache drops
  the shift augmentation entirely;
* the cache is tied to the tower weights it was extracted with. Production
  towers are frozen pretrained weights, so one extraction per dataset; the
  meta file records the source run for sanity.

Usage:
    python -m mdt_policy_tpu.data.extract_embeddings \
        --data-dir /data/task_D_D/training --train-folder runs/<name> \
        [--aug-variants 3]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from .extract import _episode_files

logger = logging.getLogger(__name__)

__all__ = ["extract_embeddings", "make_aug_fwd", "EMBEDDING_FILES",
           "AUG_EMBEDDING_FILES"]

EMBEDDING_FILES = ("ep_voltron_tokens.npy", "ep_clip_img_emb.npy")
AUG_EMBEDDING_FILES = ("ep_voltron_tokens_aug.npy", "ep_clip_img_emb_aug.npy")


class _FrameReader:
    """Raw uint8 camera frames by extraction row: contiguous mmap gathers
    when data/extract.py frame arrays exist, per-npz loads otherwise."""

    def __init__(self, dataset_dir: Path):
        dataset_dir = Path(dataset_dir)
        ex = dataset_dir / "extracted"
        if (ex / "ep_rgb_static.npy").exists() and \
                (ex / "ep_rgb_gripper.npy").exists():
            self.static = np.load(ex / "ep_rgb_static.npy", mmap_mode="r")
            self.gripper = np.load(ex / "ep_rgb_gripper.npy", mmap_mode="r")
            self.files = None
            with open(ex / "ep_npz_names.list") as f:
                self.names = [int(x.strip()) for x in f]
        else:
            self.files, self.names = _episode_files(dataset_dir)
            self.static = self.gripper = None

    def __len__(self) -> int:
        return len(self.names)

    def read(self, rows: np.ndarray):
        if self.files is None:
            return np.asarray(self.static[rows]), np.asarray(self.gripper[rows])
        s, g = [], []
        for r in rows:
            with np.load(self.files[int(r)]) as ep:
                s.append(np.asarray(ep["rgb_static"]))
                g.append(np.asarray(ep["rgb_gripper"]))
        return np.stack(s), np.stack(g)


def extract_lang_goals(dataset_dir, net, params, *, out_dir=None,
                       lang_folder: str = "lang_clip_resnet50",
                       context_length: int = 77) -> Optional[Path]:
    """Cache the frozen CLIP-text goal embeddings of every annotation
    sentence: `extracted/ep_lang_goal_emb.npy`, row-aligned with the
    auto_lang_ann annotation order (the dataset's lang_lookup indices into
    it). The text tower is frozen, so like the camera towers its outputs are
    constants — with this cache the train step runs NO tower at all.
    Returns None (with a log) when the split carries no annotations."""
    import jax

    from mdt_policy_tpu.utils.clip_tokenizer import tokenize

    dataset_dir = Path(dataset_dir)
    out_dir = Path(out_dir) if out_dir else dataset_dir / "extracted"
    for cand in (dataset_dir / lang_folder / "auto_lang_ann.npy",
                 dataset_dir / "auto_lang_ann.npy"):
        if cand.exists():
            lang_data = np.load(cand, allow_pickle=True).item()
            break
    else:
        logger.info("no auto_lang_ann.npy under %s — lang goal cache skipped",
                    dataset_dir)
        return None
    import jax.numpy as jnp

    texts = list(lang_data["language"]["ann"])
    ids = tokenize(texts, context_length)
    emb = jax.device_get(net.apply({"params": params}, jnp.asarray(ids),
                                   method="encode_language_goal"))
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "ep_lang_goal_emb.npy"
    np.save(out, np.asarray(emb, np.float32))
    logger.info("cached %d annotation goal embeddings -> %s", len(texts), out)
    return out


def make_aug_fwd(net, params, *, static_size: int, gripper_size: int,
                 static_pad: int = 10, gripper_pad: int = 4):
    """Jitted TRAIN-pipeline tower forward: resize -> DrQ random shift ->
    CLIP-normalize -> frozen towers — byte-for-byte the sequence the
    in-program full-mode step applies (loader.Preprocessor._train_impl with
    the production pads, then voltron_camera_tokens / encode_visual_goal).
    Standalone so the parity test drives exactly the function extraction
    writes the cache with. Returns fwd(static_u8, gripper_u8, key)."""
    import jax

    from .transforms import preprocess_rgb_train

    @jax.jit
    def fwd(static_u8, gripper_u8, key):
        k1, k2 = jax.random.split(key)
        s = preprocess_rgb_train(k1, static_u8, size=static_size,
                                 shift_pad=static_pad)
        g = preprocess_rgb_train(k2, gripper_u8, size=gripper_size,
                                 shift_pad=gripper_pad)
        tokens = net.apply({"params": params}, s, g,
                           method="voltron_camera_tokens")
        # the goal-image tower sees the augmented static frame too: in full
        # mode the goal frame rides the same rgb_static train pipeline
        # (ref mdtv_agent.py:346 encodes batch["rgb_static"][:, -1])
        emb = net.apply({"params": params}, s, method="encode_visual_goal")
        return tokens, emb

    return fwd


def extract_embeddings(dataset_dir, net, params, *, batch_size: int = 64,
                       out_dir=None, self_check: int = 2,
                       source: str = "", aug_variants: int = 0,
                       aug_seed: int = 0, static_pad: int = 10,
                       gripper_pad: int = 4) -> Path:
    """Run the frozen towers over every frame of a split and cache their
    outputs under `extracted/`. `net`/`params` must be an MDT-V agent (its
    `voltron_camera_tokens` / `encode_visual_goal` methods ARE the frozen
    boundary the cache replaces)."""
    import jax

    from .transforms import preprocess_rgb_eval

    if not hasattr(net, "voltron_camera_tokens"):
        raise ValueError("embedding extraction needs the mdtv agent "
                         "(frozen Voltron/CLIP towers); got "
                         f"{type(net).__name__}")
    dataset_dir = Path(dataset_dir)
    out_dir = Path(out_dir) if out_dir else dataset_dir / "extracted"
    out_dir.mkdir(parents=True, exist_ok=True)

    cfg = net.cfg
    static_size = cfg.img_size
    gripper_size = min(84, cfg.img_size)

    @jax.jit
    def fwd(static_u8, gripper_u8):
        # the production EVAL camera pipeline (loader.Preprocessor._eval_impl):
        # resize + CLIP-normalize, no augmentation — the exact frames the
        # towers see at rollout time
        s = preprocess_rgb_eval(static_u8, size=static_size)
        g = preprocess_rgb_eval(gripper_u8, size=gripper_size)
        tokens = net.apply({"params": params}, s, g,
                           method="voltron_camera_tokens")
        emb = net.apply({"params": params}, s, method="encode_visual_goal")
        return tokens, emb

    reader = _FrameReader(dataset_dir)
    n = len(reader)
    B = min(batch_size, n)

    def run(lo: int) -> tuple:
        rows = np.arange(lo, min(lo + B, n))
        if len(rows) < B:  # pad the tail to the compiled shape, slice after
            rows = np.concatenate([rows, np.full(B - len(rows), rows[-1])])
        tok, emb = jax.device_get(fwd(*reader.read(rows)))
        k = min(B, n - lo)
        return tok[:k], emb[:k]

    # augmented-variant forward: per-(variant, batch) keys derived from
    # aug_seed are reproducible, so the self-check (and any re-extraction)
    # recomputes bit-identical rows
    fwd_aug = make_aug_fwd(net, params, static_size=static_size,
                           gripper_size=gripper_size, static_pad=static_pad,
                           gripper_pad=gripper_pad) if aug_variants else None

    def aug_key(k: int, lo: int):
        import jax
        return jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(aug_seed), k), lo)

    def run_aug(lo: int, k: int) -> tuple:
        rows = np.arange(lo, min(lo + B, n))
        if len(rows) < B:
            rows = np.concatenate([rows, np.full(B - len(rows), rows[-1])])
        tok, emb = jax.device_get(
            fwd_aug(*reader.read(rows), aug_key(k, lo)))
        kk = min(B, n - lo)
        return tok[:kk], emb[:kk]

    tok0, emb0 = run(0)
    tokens_mm = np.lib.format.open_memmap(
        out_dir / "ep_voltron_tokens.npy", mode="w+", dtype=np.uint16,
        shape=(n,) + tok0.shape[1:])
    emb_mm = np.lib.format.open_memmap(
        out_dir / "ep_clip_img_emb.npy", mode="w+", dtype=np.float32,
        shape=(n,) + emb0.shape[1:])
    tokens_mm[:len(tok0)] = tok0.view(np.uint16)
    emb_mm[:len(emb0)] = emb0
    aug_tok_mm = aug_emb_mm = None
    if aug_variants:
        aug_tok_mm = np.lib.format.open_memmap(
            out_dir / "ep_voltron_tokens_aug.npy", mode="w+", dtype=np.uint16,
            shape=(n, aug_variants) + tok0.shape[1:])
        aug_emb_mm = np.lib.format.open_memmap(
            out_dir / "ep_clip_img_emb_aug.npy", mode="w+", dtype=np.float32,
            shape=(n, aug_variants) + emb0.shape[1:])
    for lo in range(B, n, B):
        tok, emb = run(lo)
        tokens_mm[lo:lo + len(tok)] = tok.view(np.uint16)
        emb_mm[lo:lo + len(emb)] = emb
        if (lo // B) % 50 == 0:
            logger.info("extracted embeddings: %d/%d frames", lo, n)
    for k in range(aug_variants):
        for lo in range(0, n, B):
            tok, emb = run_aug(lo, k)
            aug_tok_mm[lo:lo + len(tok), k] = tok.view(np.uint16)
            aug_emb_mm[lo:lo + len(emb), k] = emb
        logger.info("extracted aug variant %d/%d", k + 1, aug_variants)
    tokens_mm.flush()
    emb_mm.flush()
    if aug_variants:
        aug_tok_mm.flush()
        aug_emb_mm.flush()

    names_file = out_dir / "ep_npz_names.list"
    if not names_file.exists():
        names_file.write_text("\n".join(str(x) for x in reader.names) + "\n")
    else:
        with open(names_file) as f:
            existing = [int(x.strip()) for x in f]
        if existing != list(reader.names):
            raise RuntimeError(f"{names_file} row order disagrees with the "
                               "frame sweep — extracted/ is inconsistent")

    (out_dir / "embeddings_meta.json").write_text(json.dumps({
        "voltron_tokens": {"dtype": "bfloat16 (uint16 bits)",
                           "shape": list(tokens_mm.shape)},
        "clip_img_emb": {"dtype": "float32", "shape": list(emb_mm.shape)},
        "img_size": static_size,
        "aug_variants": aug_variants,
        "aug_seed": aug_seed,
        "aug_pads": {"static": static_pad, "gripper": gripper_pad},
        "source": source,
    }, indent=2))

    # self-check: recompute random batch-aligned chunks and compare bit-exact
    # (the reference extract_by_key's random-row re-read, :104-121)
    rng = np.random.default_rng(0)
    n_chunks = max(1, (n + B - 1) // B)
    for lo in rng.integers(0, n_chunks, min(self_check, n_chunks)) * B:
        tok, emb = run(int(lo))
        np.testing.assert_array_equal(tokens_mm[lo:lo + len(tok)],
                                      tok.view(np.uint16))
        np.testing.assert_array_equal(emb_mm[lo:lo + len(emb)], emb)
        if aug_variants:  # deterministic keys: recompute must be bit-exact
            k = int(rng.integers(0, aug_variants))
            atok, aemb = run_aug(int(lo), k)
            np.testing.assert_array_equal(
                aug_tok_mm[lo:lo + len(atok), k], atok.view(np.uint16))
            np.testing.assert_array_equal(aug_emb_mm[lo:lo + len(aemb), k], aemb)
    logger.info("extracted embeddings for %d frames -> %s "
                "(voltron %s bf16, clip %s f32)", n, out_dir,
                tokens_mm.shape, emb_mm.shape)
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--data-dir", required=True,
                    help="dataset split dir (training/ or validation/)")
    ap.add_argument("--train-folder", required=True,
                    help="training run dir whose (frozen) tower weights "
                         "compute the embeddings")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--aug-variants", type=int, default=0,
                    help="also cache K DrQ-shift-augmented embedding variants "
                         "per frame (restores the reference's RandomShiftsAug "
                         "to cache-mode training; K=2-4 typical)")
    ap.add_argument("--aug-seed", type=int, default=0)
    ap.add_argument("--no-ema", action="store_true",
                    help="use raw instead of EMA weights (frozen towers are "
                         "identical under both; this only matters for "
                         "sanity experiments)")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--lang-folder", default="lang_clip_resnet50",
                    help="annotation folder whose sentences get text-goal "
                         "embeddings cached (skipped when absent)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from mdt_policy_tpu.evaluate import load_run_agent
    net, params, _, _ = load_run_agent(args.train_folder,
                                       use_ema=not args.no_ema)
    extract_embeddings(args.data_dir, net, params,
                       batch_size=args.batch_size, out_dir=args.out_dir,
                       source=str(args.train_folder),
                       aug_variants=args.aug_variants, aug_seed=args.aug_seed)
    extract_lang_goals(args.data_dir, net, params, out_dir=args.out_dir,
                       lang_folder=args.lang_folder,
                       context_length=net.cfg.clip_context_length)


if __name__ == "__main__":
    main()
