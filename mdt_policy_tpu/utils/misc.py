"""Miscellaneous runtime utilities (ref `mdt/utils/utils.py:17-195`)."""

from __future__ import annotations

import functools
import logging
import platform
import subprocess
import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["timeit", "get_git_commit_hash", "print_system_env_info",
           "initialize_pretrained_weights", "get_portion_of_batch_ids"]


def timeit(fn):
    """Wall-clock decorator (ref utils.py:17-29)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        logger.info("%s took %.3fs", fn.__name__, time.perf_counter() - t0)
        return out
    return wrapper


def get_git_commit_hash(repo_path: Optional[Path] = None) -> str:
    """(ref utils.py:44-62)"""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_path or Path(__file__).resolve().parents[2],
            text=True).strip()
    except Exception:
        return "unknown"


def print_system_env_info() -> Dict[str, Any]:
    """(ref utils.py:91-137) — JAX-era system dump."""
    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_count": jax.process_count(),
        "git_commit": get_git_commit_hash(),
    }
    for k, v in info.items():
        logger.info("%s: %s", k, v)
    return info


def initialize_pretrained_weights(params: Dict, pretrained: Dict,
                                  skip_prefixes: Sequence[str] = ()) -> Dict:
    """Partial checkpoint initialization: copy every leaf present in
    `pretrained` with a matching path+shape into `params`
    (ref initialize_pretrained_weights, utils.py:32-42)."""
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    pre_flat = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    out = dict(flat)
    copied = 0
    for path, leaf in pre_flat.items():
        key_str = jax.tree_util.keystr(path)
        if any(key_str.startswith(f"['{p}']") for p in skip_prefixes):
            continue
        if path in flat and flat[path].shape == leaf.shape:
            out[path] = leaf
            copied += 1
    logger.info("initialized %d/%d leaves from pretrained weights",
                copied, len(flat))
    treedef = jax.tree_util.tree_structure(params)
    ordered = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def get_portion_of_batch_ids(percentage: float, batch_size: int) -> np.ndarray:
    """Deterministically spread indices over a batch (ref utils.py:139-158)."""
    num = int(batch_size * percentage)
    if num == 0:
        return np.array([], dtype=int)
    indices = np.linspace(0, batch_size - 1, num)
    return np.unique(np.round(indices).astype(int))


def enable_compile_cache(default_dir: str = "/root/.cache/jaxcomp") -> None:
    """Point JAX at a persistent compilation cache (full-size programs take
    minutes to build cold on a 1-core host; warm reruns load in seconds).
    Honors JAX_COMPILATION_CACHE_DIR; silently a no-op if the config knob is
    unavailable."""
    import os

    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         default_dir))
    except Exception:
        pass
