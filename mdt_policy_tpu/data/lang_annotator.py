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

import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["annotate_episodes", "write_auto_lang_ann", "write_embeddings"]


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
