"""Checkpointing: Orbax save/restore of the full TrainState (params + EMA +
optimizer state + step).

Replaces the reference's PL ModelCheckpoint + EMA-callback-state persistence
(conf/callbacks/checkpoint/lh_sr.yaml, `mdt/callbacks/ema.py:144-153`) and the
auto-resume path (`mdt/training.py:46-50`, `mdt/utils/utils.py:64-79`):

* every checkpoint carries BOTH raw and EMA params (the reference stores EMA
  weights in callback state and prefers them at eval — we restore `ema_params`
  for evaluation the same way);
* `best_metric` tracking mirrors ModelCheckpoint(save_top_k=1,
  monitor='eval_lh/avg_seq_len', mode=max);
* `latest_checkpoint` gives training.py-style auto-resume.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["Checkpointer", "latest_checkpoint"]


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Newest step directory under ckpt_dir (ref get_last_checkpoint,
    mdt/utils/utils.py:64-79 — mtime ordering replaced by step ordering)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = [p for p in ckpt_dir.iterdir() if p.is_dir() and p.name.isdigit()]
    return max(steps, key=lambda p: int(p.name)) if steps else None


class Checkpointer:
    """Thin Orbax wrapper saving {params, ema_params, opt_state, step}."""

    def __init__(self, ckpt_dir, keep: int = 1):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()
        self._best_file = self.ckpt_dir / "best.json"

    def _tree(self, state) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        }

    def save(self, state, *, metric: Optional[float] = None,
             metric_name: str = "eval_lh/avg_seq_len", wait: bool = False) -> Path:
        """Asynchronous by default: orbax copies the state to host memory
        synchronously (so the caller may immediately donate/overwrite the
        device buffers) and serializes in a background thread — the train
        loop does not stall on disk. `wait=True` blocks until the files are
        durable (preemption saves, end of training)."""
        step = int(state.step)
        path = self.ckpt_dir / str(step)
        # only one async save may be in flight; settle the previous one
        self._ckpt.wait_until_finished()
        self._ckpt.save(path.resolve(), self._tree(state), force=True)
        if wait or metric is not None:
            # best.json must never point at a step that wasn't committed
            # (a hard kill mid-background-write would strand evaluate.py)
            self._ckpt.wait_until_finished()
        if metric is not None:
            self._update_best(step, metric, metric_name)
        self._gc()  # never touches the newest (in-flight) step dir
        return path

    def wait(self):
        """Block until any in-flight async save is durable on disk."""
        self._ckpt.wait_until_finished()

    def _update_best(self, step: int, metric: float, metric_name: str):
        """save_top_k=1 on a max-metric (ref conf/callbacks/checkpoint/lh_sr.yaml)."""
        best = {"step": None, "metric": -np.inf, "metric_name": metric_name}
        if self._best_file.exists():
            best = json.loads(self._best_file.read_text())
        if metric >= best["metric"]:
            self._best_file.write_text(json.dumps(
                {"step": step, "metric": metric, "metric_name": metric_name}))

    def _gc(self):
        steps = sorted((p for p in self.ckpt_dir.iterdir()
                        if p.is_dir() and p.name.isdigit()),
                       key=lambda p: int(p.name))
        best_step = None
        if self._best_file.exists():
            best_step = json.loads(self._best_file.read_text())["step"]
        excess = steps[:-self.keep] if self.keep else []
        for p in excess:
            if best_step is not None and int(p.name) == best_step:
                continue
            import shutil
            shutil.rmtree(p)

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the template's structure; returns a new TrainState."""
        self._ckpt.wait_until_finished()  # settle any in-flight async save
        path = (self.ckpt_dir / str(step)) if step is not None \
            else latest_checkpoint(self.ckpt_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        restored = self._ckpt.restore(Path(path).resolve(),
                                      self._tree(state_template))
        # step as a HOST scalar: orbax restores it committed to one device,
        # which conflicts with mesh-sharded params inside the next jitted
        # step ("incompatible devices"); an uncommitted scalar lets jit
        # place it with the rest of the state
        return state_template.replace(
            step=int(restored["step"]), params=restored["params"],
            ema_params=restored["ema_params"], opt_state=restored["opt_state"])

    def best_step(self) -> Optional[int]:
        if self._best_file.exists():
            return json.loads(self._best_file.read_text())["step"]
        return None
