"""Host batching + device feeding.

Replaces the reference's torch DataLoader stack (12 workers, pin_memory,
CPU torchvision transforms — `mdt/datasets/hulc_data_module.py:136-161`) with:

* a sharded host loader: per-epoch shuffled index permutations (the seed-242
  epoch/shuffle semantics of the reference recipe), a thread pool decoding
  samples in parallel (npz zlib-decompress and file IO release the GIL; all
  pixel math is on-device so threads — not worker processes — saturate the
  host without pickling batches across process boundaries),
* `Preprocessor`: one jitted function applying the production camera
  pipelines (data/transforms.py) to a raw uint8 batch on the TPU,
* dual-stream `{'vis','lang'}` batches (the Lightning multi-loader,
  hulc_data_module.py:136-147) via paired loaders,
* multi-host sharding: `shard_index/num_shards` slice every epoch permutation
  so each host reads only its slice of the global batch (the DDP sampler
  equivalent).

Language text is tokenized host-side with the CLIP BPE tokenizer (the
`use_text_not_embedding=True` production path, mdt_agent.py:360-363).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .transforms import preprocess_rgb_eval, preprocess_rgb_train

__all__ = ["collate", "BatchLoader", "DualStreamLoader", "Preprocessor",
           "DevicePrefetcher"]


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
    """Epoch-shuffled batch iterator: parallel sample decode + prefetch.

    Each epoch is a fresh seeded permutation of the dataset (sampling WITHOUT
    replacement — the reference DataLoader(shuffle=True) semantics); batches
    are cut from the permutation and partial tails dropped. `num_workers`
    threads decode samples concurrently; `prefetch` finished batches are
    buffered ahead of the training loop.
    """

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 prefetch: int = 2, num_workers: Optional[int] = None,
                 tokenizer=None, context_length: int = 77,
                 shard_index: int = 0, num_shards: int = 1,
                 start_batch: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.prefetch = prefetch
        self.start_batch = start_batch
        self.num_workers = (num_workers if num_workers is not None
                            else min(8, os.cpu_count() or 1))
        self.tokenizer = tokenizer
        self.context_length = context_length
        self.shard_index, self.num_shards = shard_index, num_shards
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._pool: Optional[ThreadPoolExecutor] = None
        self._stop = threading.Event()
        self.epoch = 0

    def _index_batches(self) -> Iterator[np.ndarray]:
        """Infinite stream of index batches over per-epoch permutations.

        `start_batch` fast-forwards the stream by whole batches (index math
        only, nothing decoded) so a preempted run resumes with exactly the
        batch it would have seen next — deterministic preemption recovery,
        which the reference's Lightning auto-resume does not have (its
        dataloaders restart from a fresh epoch on every resume)."""
        n = len(self.dataset)
        skip = self.start_batch
        while True:
            perm = np.random.default_rng(self.seed + self.epoch).permutation(n)
            shard = perm[self.shard_index::self.num_shards]
            starts = range(0, len(shard) - self.batch_size + 1, self.batch_size)
            if skip >= len(starts):
                skip -= len(starts)
                self.epoch += 1
                continue
            for j, i in enumerate(starts):
                if j < skip:
                    continue
                yield shard[i:i + self.batch_size]
            skip = 0
            self.epoch += 1

    def _make_batch(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        batch = self._gather_batch(idxs)
        if batch is None:  # per-sample fallback (no extracted frame arrays)
            samples = list(self._pool.map(self.dataset.__getitem__,
                                          [int(i) for i in idxs]))
            batch = collate(samples)
        if "lang_text" in batch and self.tokenizer is not None:
            batch["lang_tokens"] = self.tokenizer(
                batch.pop("lang_text"), self.context_length)
        return batch

    def _gather_batch(self, idxs: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """Vectorized fast path: dataset.get_batch gathers the whole batch
        with one fancy-index per key; slices go to the worker pool so the
        memcpy parallelizes across cores."""
        get_batch = getattr(self.dataset, "get_batch", None)
        if get_batch is None:
            return None
        n_slices = max(1, min(self.num_workers, len(idxs) // 16))
        if n_slices == 1:
            return get_batch(idxs)
        slices = np.array_split(np.asarray(idxs), n_slices)
        parts = list(self._pool.map(get_batch, slices))
        if any(p is None for p in parts):
            return None
        out: Dict[str, np.ndarray] = {}
        for k in parts[0]:
            if isinstance(parts[0][k], list):
                out[k] = [x for p in parts for x in p[k]]
            else:
                out[k] = np.concatenate([p[k] for p in parts])
        return out

    def _worker(self):
        try:
            for idxs in self._index_batches():
                if self._stop.is_set():
                    return
                batch = self._make_batch(idxs)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=1.0)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to the consumer, don't hang it
            while not self._stop.is_set():  # bounded: close() releases us
                try:
                    self._q.put(e, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._thread is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers,
                                            thread_name_prefix="mdt-decode")
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        while True:
            item = self._q.get()
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self):
        self._stop.set()
        if self._pool is not None:
            self._pool.shutdown(wait=False)


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


class DevicePrefetcher:
    """Keep `depth` device-resident batches ahead of the training loop.

    A background thread pulls raw host batches, runs the caller's
    `device_fn(key, raw)` (shard/device_put + jitted preprocessing — all
    asynchronous JAX dispatch, so the H2D DMA and the tiny preprocessing
    program execute while the main thread's train step occupies the chip)
    and parks the resulting on-device batch in a bounded queue. This turns
    the per-step sequence  decode -> transfer -> compute  into a 3-stage
    pipeline: the loader thread decodes batch N+2, this thread transfers
    batch N+1, the chip computes batch N. Without it the host sits inside
    `device_put` for the full transfer time of every batch (the reference's
    equivalent is torch `pin_memory` + `non_blocking` copies,
    hulc_data_module.py:136-147 — but those still serialize with Python).

    Per-batch augmentation keys are derived as fold_in(key, i) over the
    running batch index, so the stream stays deterministic for a fixed seed
    regardless of pipeline depth.
    """

    def __init__(self, raw_iter, device_fn, key, *, depth: int = 2,
                 start_index: int = 0, preloaded=()):
        self._iter = raw_iter
        self._fn = device_fn
        self._key = key
        self._start = start_index
        self._preloaded = tuple(preloaded)  # already-on-device batches,
        # yielded first (e.g. the init batch — no second H2D transfer)
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, len(preloaded)))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="mdt-device-prefetch")
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=1.0)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            for pre in self._preloaded:
                if not self._put(pre):
                    return
            i = self._start
            for raw in self._iter:
                if self._stop.is_set():
                    return
                out = self._fn(jax.random.fold_in(self._key, i), raw)
                i += 1
                if not self._put(out):
                    return
        except BaseException as e:  # propagate to the consumer, don't hang it
            self._put(e)  # bounded: gives up once close() is called

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()


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
        k1, k2, kd = jax.random.split(key, 3)
        out = dict(batch)
        # camera keys are absent in precomputed-embedding batches
        # (data/extract_embeddings.py): voltron_tokens/image_latent_goal
        # pass through untouched — the towers already saw eval-preprocessed
        # frames at extraction time
        if "rgb_static" in batch:
            out["rgb_static"] = preprocess_rgb_train(
                k1, batch["rgb_static"], size=self.static_size,
                shift_pad=self.static_pad)
        if "rgb_gripper" in batch:
            out["rgb_gripper"] = preprocess_rgb_train(
                k2, batch["rgb_gripper"], size=self.gripper_size,
                shift_pad=self.gripper_pad)
        out["gen_static"] = preprocess_rgb_eval(batch["gen_static"], size=self.gen_size)
        out["gen_gripper"] = preprocess_rgb_eval(batch["gen_gripper"], size=self.gen_size)
        out["actions"] = batch["actions"].astype(jnp.float32)
        # depth pipeline (calvin_transforms.yaml): per-sample gamma noise on
        # depth_static, +N(0, 0.01) on every depth key (frames arrive at
        # their native sizes — the Resize stages are identities)
        from .transforms import add_depth_noise, add_gaussian_noise
        for i, dk in enumerate(sorted(k for k in batch if k.startswith("depth"))):
            kk = jax.random.fold_in(kd, i)
            d = batch[dk].astype(jnp.float32)
            if "static" in dk:
                d = add_depth_noise(jax.random.fold_in(kk, 0), d,
                                    sample_shape=(d.shape[0],))
            out[dk] = add_gaussian_noise(jax.random.fold_in(kk, 1), d, std=0.01)
        return out

    def _eval_impl(self, batch):
        out = dict(batch)
        if "rgb_static" in batch:
            out["rgb_static"] = preprocess_rgb_eval(batch["rgb_static"],
                                                    size=self.static_size)
        if "rgb_gripper" in batch:
            # goal-image calls carry only the static camera frame
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
