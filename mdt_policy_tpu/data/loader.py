"""Host batching + device feeding.

Replaces the reference's torch DataLoader stack (12 workers, pin_memory,
CPU torchvision transforms — `mdt/datasets/hulc_data_module.py:136-161`) with:

* a light host loader: index sampling + numpy collation + background-thread
  prefetch (file IO is the only host work; all pixel math is on-device),
* `Preprocessor`: one jitted function applying the production camera
  pipelines (data/transforms.py) to a raw uint8 batch on the TPU,
* dual-stream `{'vis','lang'}` batches (the Lightning multi-loader,
  hulc_data_module.py:136-147) via paired loaders.

Language text is tokenized host-side with the CLIP BPE tokenizer (the
`use_text_not_embedding=True` production path, mdt_agent.py:360-363).
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .transforms import preprocess_rgb_eval, preprocess_rgb_train

__all__ = ["collate", "BatchLoader", "DualStreamLoader", "Preprocessor"]


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack a list of dataset samples into a batch dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            out[k] = list(vals)  # type: ignore[assignment]
        else:
            out[k] = np.stack(vals)
    return out


class BatchLoader:
    """Shuffled, epoch-less batch iterator with background prefetch."""

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 prefetch: int = 2, tokenizer=None, context_length: int = 77):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.tokenizer = tokenizer
        self.context_length = context_length
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _make_batch(self) -> Dict[str, np.ndarray]:
        idxs = self.rng.integers(0, len(self.dataset), self.batch_size)
        batch = collate([self.dataset[int(i)] for i in idxs])
        if "lang_text" in batch and self.tokenizer is not None:
            batch["lang_tokens"] = self.tokenizer(
                batch.pop("lang_text"), self.context_length)
        return batch

    def _worker(self):
        while not self._stop.is_set():
            try:
                self._q.put(self._make_batch(), timeout=1.0)
            except queue.Full:
                continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        while True:
            yield self._q.get()

    def close(self):
        self._stop.set()


class DualStreamLoader:
    """Pairs a vision and a language loader into {'vis': ..., 'lang': ...}
    batches (the reference's dict-of-dataloaders, hulc_data_module.py:136-147)."""

    def __init__(self, vis_loader: BatchLoader, lang_loader: BatchLoader):
        self.vis = vis_loader
        self.lang = lang_loader

    def __iter__(self):
        for vis_b, lang_b in zip(self.vis, self.lang):
            yield {"vis": vis_b, "lang": lang_b}

    def close(self):
        self.vis.close()
        self.lang.close()


class Preprocessor:
    """Jitted on-device preprocessing of a raw uint8 batch into the agent's
    input batch (production pipelines, calvin_transforms.yaml)."""

    def __init__(self, *, static_size: int = 224, gripper_size: int = 84,
                 gen_size: int = 112, static_pad: int = 10, gripper_pad: int = 4):
        self.static_size, self.gripper_size = static_size, gripper_size
        self.gen_size = gen_size
        self.static_pad, self.gripper_pad = static_pad, gripper_pad
        self._train = jax.jit(self._train_impl)
        self._eval = jax.jit(self._eval_impl)

    def _train_impl(self, key, batch):
        k1, k2 = jax.random.split(key)
        out = dict(batch)
        out["rgb_static"] = preprocess_rgb_train(
            k1, batch["rgb_static"], size=self.static_size, shift_pad=self.static_pad)
        out["rgb_gripper"] = preprocess_rgb_train(
            k2, batch["rgb_gripper"], size=self.gripper_size, shift_pad=self.gripper_pad)
        out["gen_static"] = preprocess_rgb_eval(batch["gen_static"], size=self.gen_size)
        out["gen_gripper"] = preprocess_rgb_eval(batch["gen_gripper"], size=self.gen_size)
        out["actions"] = batch["actions"].astype(jnp.float32)
        return out

    def _eval_impl(self, batch):
        out = dict(batch)
        out["rgb_static"] = preprocess_rgb_eval(batch["rgb_static"], size=self.static_size)
        out["rgb_gripper"] = preprocess_rgb_eval(batch["rgb_gripper"], size=self.gripper_size)
        if "gen_static" in batch:
            out["gen_static"] = preprocess_rgb_eval(batch["gen_static"], size=self.gen_size)
            out["gen_gripper"] = preprocess_rgb_eval(batch["gen_gripper"], size=self.gen_size)
        if "actions" in batch:
            out["actions"] = batch["actions"].astype(jnp.float32)
        return out

    def train_batch(self, key, raw: Dict[str, np.ndarray]):
        arrays = {k: v for k, v in raw.items()
                  if not isinstance(v, list) and v.dtype != object}
        return self._train(key, arrays)

    def eval_batch(self, raw: Dict[str, np.ndarray]):
        arrays = {k: v for k, v in raw.items()
                  if not isinstance(v, list) and v.dtype != object}
        return self._eval(arrays)
