"""Offline language annotation tooling.

Re-implements the reference's annotator pipeline
(`mdt/utils/automatic_lang_annotator_mp.py:47-371`, `language_annotator.py:16-86`)
in framework terms: scan episode windows with the symbolic task oracle,
attach a natural-language instruction per detected task, embed the
instructions with the CLIP text tower, and write the `auto_lang_ann.npy`
(training) / `embeddings.npy` (validation lookup) files the data pipeline and
evaluator consume (formats: disk_dataset.py:114-123, evaluation/utils.py:219-227).

The env task oracle is pluggable: any callable
`(start_info, end_info) -> set[str]` works — calvin_env's Tasks oracle in
production, ScriptedOracle in tests.
"""

from __future__ import annotations

import argparse
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["annotate_episodes", "scan_dataset", "write_auto_lang_ann",
           "write_embeddings", "clip_embed_fn", "st_embed_fn", "make_embed_fn"]


def annotate_episodes(
    detect_tasks: Callable[[Dict, Dict], Sequence[str]],
    frame_infos: Sequence[Dict],
    annotations: Dict[str, Sequence[str]],
    *,
    window: int = 64,
    stride: int = 16,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[Tuple[int, int]], List[str], List[str]]:
    """Slide a window over frame infos; whenever the oracle detects exactly
    one completed task, record (start, end), the task, and a sampled
    annotation sentence (ref automatic_lang_annotator_mp.py:100-180 logic)."""
    rng = rng or np.random.default_rng(0)
    indices, tasks, sentences = [], [], []
    for start in range(0, len(frame_infos) - window, stride):
        end = start + window
        detected = list(detect_tasks(frame_infos[start], frame_infos[end]))
        if len(detected) != 1:
            continue
        task = detected[0]
        if task not in annotations:
            continue
        sent = annotations[task][int(rng.integers(len(annotations[task])))]
        indices.append((start, end))
        tasks.append(task)
        sentences.append(sent)
    return indices, tasks, sentences


def write_auto_lang_ann(out_dir, indices, tasks, sentences, embeddings
                        ) -> Path:
    """auto_lang_ann.npy with the reference's dict layout
    (disk_dataset.py:114-123: language.emb/ann/task + info.indx)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    data = {
        "language": {
            "emb": np.asarray(embeddings, np.float32),
            "ann": list(sentences),
            "task": list(tasks),
        },
        "info": {"indx": list(indices)},
    }
    path = out_dir / "auto_lang_ann.npy"
    np.save(path, data, allow_pickle=True)
    logger.info("wrote %d annotations -> %s", len(sentences), path)
    return path


def write_embeddings(out_dir, val_annotations: Dict[str, Sequence[str]],
                     embed_fn: Callable[[str], np.ndarray]) -> Path:
    """embeddings.npy: {task: {'ann': [sentence], 'emb': embedding}} — the
    evaluator's goal lookup (evaluation/utils.py:219-227)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    table = {}
    for task, sents in val_annotations.items():
        sent = sents[0]
        table[task] = {"ann": [sent], "emb": np.asarray(embed_fn(sent), np.float32)}
    path = out_dir / "embeddings.npy"
    np.save(path, table, allow_pickle=True)
    logger.info("wrote %d goal embeddings -> %s", len(table), path)
    return path


# ---------------------------------------------------------------------------
# Dataset scanning + CLI (the reference's mp scanning pipeline,
# automatic_lang_annotator_mp.py:47-371, as a thread-parallel sweep)
# ---------------------------------------------------------------------------

def scan_dataset(
    dataset_dir,
    detect_tasks: Callable[[Dict, Dict], Sequence[str]],
    annotations: Dict[str, Sequence[str]],
    *,
    window: int = 64,
    stride: int = 16,
    num_workers: int = 4,
    seed: int = 0,
) -> Tuple[List[Tuple[int, int]], List[str], List[str]]:
    """Sweep a CALVIN split per episode: build per-frame state infos
    ({robot_obs, scene_obs}, the oracle's contract) from the extracted state
    arrays (or npz fallback) and annotate windows in parallel across
    episodes. Returns global-frame-indexed (indices, tasks, sentences)."""
    from .dataset import CalvinDataset

    ds = CalvinDataset(dataset_dir, key="vis", min_window_size=1,
                       max_window_size=1, use_extracted_rel_actions=False,
                       include_scene_obs=False)
    bounds = ds.ep_start_end_ids

    def frame_info(fid: int) -> Dict:
        arrs = ds._frame_arrays(int(fid), ("robot_obs", "scene_obs"))
        return {"robot_obs": arrs["robot_obs"], "scene_obs": arrs["scene_obs"]}

    def scan_episode(ep_idx):
        start, end = int(bounds[ep_idx][0]), int(bounds[ep_idx][1])
        infos = [frame_info(i) for i in range(start, end + 1)]
        idx, tasks, sents = annotate_episodes(
            detect_tasks, infos, annotations, window=window, stride=stride,
            rng=np.random.default_rng(seed + ep_idx))
        return ([(a + start, b + start) for a, b in idx], tasks, sents)

    indices, tasks, sentences = [], [], []
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for idx, tk, st in pool.map(scan_episode, range(len(bounds))):
            indices.extend(idx)
            tasks.extend(tk)
            sentences.extend(st)
    logger.info("scanned %d episodes -> %d annotated windows",
                len(bounds), len(indices))
    return indices, tasks, sentences


def clip_embed_fn(train_folder: Optional[str] = None):
    """Sentence -> embedding through the in-program CLIP text tower (the
    reference's clip-embedding annotator option; sentence-transformers is the
    other upstream option and stays external). With `train_folder`, the
    tower's weights are restored from that run's checkpoint; otherwise the
    tower is randomly initialized (layout-valid files, untrained embeddings —
    fine for smoke/data-format purposes, logged loudly)."""
    import jax
    from mdt_policy_tpu.utils.clip_tokenizer import tokenize

    if train_folder is not None:
        from mdt_policy_tpu.evaluate import build_policy
        policy, agent_cfg, _ = build_policy(str(train_folder))
        net, params = policy.inner.net, policy.inner.params
    else:
        logger.warning("no --train-folder: embedding with a RANDOM-INIT CLIP "
                       "text tower (format-correct, semantically untrained)")
        from mdt_policy_tpu.agents import MDTVConfig, init_agent
        agent_cfg = MDTVConfig()
        example = {
            "rgb_static": np.zeros((1, 2, agent_cfg.img_size, agent_cfg.img_size, 3), np.float32),
            "rgb_gripper": np.zeros((1, 2, agent_cfg.img_size, agent_cfg.img_size, 3), np.float32),
            "gen_static": np.zeros((1, agent_cfg.gen_img_res, agent_cfg.gen_img_res, 3), np.float32),
            "gen_gripper": np.zeros((1, agent_cfg.gen_img_res, agent_cfg.gen_img_res, 3), np.float32),
            "actions": np.zeros((1, agent_cfg.act_window_size, agent_cfg.action_dim), np.float32),
            "lang_tokens": np.zeros((1, agent_cfg.clip_context_length), np.int32),
        }
        net, state = init_agent(agent_cfg, jax.random.PRNGKey(0), example)
        params = state.params

    import jax as _jax
    encode = _jax.jit(lambda toks: net.apply({"params": params}, toks,
                                             method="encode_language_goal"))

    def embed(sentence: str) -> np.ndarray:
        toks = tokenize([sentence], agent_cfg.clip_context_length)
        return np.asarray(encode(toks))[0]

    return embed


def st_embed_fn(model_name_or_path: str):
    """Sentence-transformers embedder — the upstream family behind the
    published CALVIN ``lang_paraphrase-MiniLM-L3-v2`` annotation folders.
    The reference annotator hydra-instantiates an arbitrary ``cfg.model`` as
    its lang encoder (automatic_lang_annotator_mp.py:117,214) and the shipped
    dataset configs point at sentence-transformer MiniLM folders
    (conf/datamodule/datasets/vision_lang_calvin.yaml:34); this reproduces
    that option. Pass a local model directory in zero-egress environments."""
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(str(model_name_or_path))

    def embed(sentence: str) -> np.ndarray:
        return np.asarray(model.encode([sentence], convert_to_numpy=True,
                                       show_progress_bar=False)[0], np.float32)

    return embed


def make_embed_fn(spec: str, train_folder: Optional[str] = None):
    """Resolve an ``--embedder`` spec:

    * ``clip`` — in-framework CLIP text tower, optionally restored from
      `train_folder`;
    * ``minilm:<dir>`` — the IN-REPO MiniLM encoder (models/minilm.py) over
      a local sentence-transformers/HF model folder — emits the 384-d
      MiniLM-shaped embeddings the published CALVIN annotation folders carry,
      with no external package and no egress;
    * ``st:<name-or-path>`` — the external sentence-transformers package
      (requires it installed)."""
    if spec == "clip":
        return clip_embed_fn(train_folder)
    if spec.startswith("minilm:"):
        from mdt_policy_tpu.models.minilm import minilm_embed_fn
        return minilm_embed_fn(spec[len("minilm:"):])
    if spec.startswith("st:"):
        return st_embed_fn(spec[3:])
    raise ValueError(f"unknown embedder spec {spec!r}; "
                     "expected 'clip', 'minilm:<dir>' or "
                     "'st:<model-name-or-path>'")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="CALVIN split dir to scan")
    ap.add_argument("--out", default=None, help="output lang folder "
                    "(default <root>/lang_annotations)")
    ap.add_argument("--train-folder", default=None,
                    help="run dir whose CLIP text tower embeds the sentences")
    ap.add_argument("--embedder", default="clip",
                    help="'clip' (in-framework text tower) or "
                         "'st:<model-name-or-path>' (sentence-transformers, "
                         "the published datasets' embedding family)")
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--stride", type=int, default=16)
    ap.add_argument("--validation", action="store_true",
                    help="also write embeddings.npy from the validation table")
    ap.add_argument("--scripted-oracle", default=None, metavar="TASK",
                    help="smoke mode: pretend every window completes TASK "
                         "(no calvin_env needed; format/pipeline check only)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from mdt_policy_tpu.evaluation.annotations import (
        make_task_oracle, train_annotations, validation_annotations)

    if args.scripted_oracle:
        task = args.scripted_oracle
        detect = lambda a, b: [task]
    else:
        oracle = make_task_oracle()  # needs calvin_env
        detect = lambda a, b: oracle.get_task_info(a, b)
    indices, tasks, sentences = scan_dataset(
        args.root, detect, train_annotations(),
        window=args.window, stride=args.stride)
    embed = make_embed_fn(args.embedder, args.train_folder)
    embs = np.stack([embed(s) for s in sentences]) if sentences else \
        np.zeros((0, 512), np.float32)
    out = Path(args.out) if args.out else Path(args.root) / "lang_annotations"
    write_auto_lang_ann(out, indices, tasks, sentences, embs[:, None])
    if args.validation:
        write_embeddings(out, validation_annotations(), embed)


if __name__ == "__main__":
    main()
