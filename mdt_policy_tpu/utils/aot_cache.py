"""Serialized-executable cache: warm restarts without the compile service.

The round-5 measurement story this implements (docs/BENCHMARKING.md "AOT
executable serialization"): on the remote-TPU backend the persistent XLA
compile cache is written but never consulted, so every fresh process pays
the remote compile service again — 140-560 s for the production train step
(~5x run-to-run variance). `jax.experimental.serialize_executable` sidesteps
the service entirely: the compiled executable round-trips through a file
and a fresh process deserializes it in ~19 s (381 MB blob, measured) and
runs with the identical loss. That turns a preemption/SIGTERM restart from
minutes of recompilation into seconds — the reference has no equivalent
(Lightning restarts re-trace + recompile; torch eager has no compile cost
to begin with, ref mdt/training.py:61-66 just rebuilds the trainer).

Two API pitfalls this module encodes (measured in tools/aot_full_probe.py):

- `serialize()` returns (payload, in_tree, out_tree) treedefs that are NOT
  picklable when the arguments embed optax chain closures (the TrainState's
  opt_state does). Only the payload is persisted; treedefs are rebuilt at
  load time from the caller's own example arguments via `tree_structure` +
  `eval_shape` — host-only tracing, no compile.
- A child process must target the parent's PJRT plugin ALIAS
  (`jax.config.jax_platforms`, e.g. "axon"), not `default_backend()`
  ("tpu") — not this module's concern at load time (the process is already
  initialized), but the cache key includes the alias so blobs never cross
  backends.

Validity: a blob is keyed by jax version + backend alias + device kind +
process count + the caller's `extra_key` (agent/run config repr) + the
argument avals/shardings fingerprint. Any deserialize failure falls back
to a normal compile (and overwrites the stale blob), so the cache can only
cost the ~19 s attempt, never correctness.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
from pathlib import Path
from typing import Any, Tuple

logger = logging.getLogger(__name__)


def _fingerprint(args) -> str:
    """Stable shape/dtype/sharding fingerprint of an argument pytree."""
    import jax
    import jax.tree_util as jtu

    parts = []
    for leaf in jtu.tree_leaves(args):
        shard = getattr(leaf, "sharding", None)
        parts.append(f"{getattr(leaf, 'shape', ())}:"
                     f"{getattr(leaf, 'dtype', type(leaf).__name__)}:"
                     f"{shard}")
    return "|".join(parts)


def cache_key(args, extra_key: str = "") -> str:
    import jax

    backend = getattr(jax.config, "jax_platforms", None) \
        or jax.default_backend()
    src = "\n".join([
        jax.__version__,
        str(backend),
        jax.devices()[0].device_kind,
        str(jax.process_count()),
        str(jax.process_index()),  # executables are per-process
        extra_key,
        _fingerprint(args),
    ])
    return hashlib.sha256(src.encode()).hexdigest()[:20]


def compile_with_cache(jitted, args: Tuple[Any, ...], cache_dir,
                       *, tag: str = "step", extra_key: str = ""):
    """Compile `jitted(*args)` with a serialized-executable cache.

    Returns (compiled, status) where status is "hit" (deserialized, no
    compile), "miss" (compiled + blob saved) or "miss-nosave" (compiled;
    serialization unavailable on this backend). The returned `compiled` is
    the AOT executable: call it with arguments of exactly the example's
    avals/shardings (donation is preserved from the jit).
    """
    import jax
    import jax.tree_util as jtu

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = cache_dir / f"{tag}-{cache_key(args, extra_key)}.jaxexe"

    in_tree = jtu.tree_structure((tuple(args), {}))
    if path.exists():
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)["payload"]
            out_tree = jtu.tree_structure(jax.eval_shape(jitted, *args))
            # deserialize_and_load defaults execution_devices to ALL of the
            # backend's devices; an executable compiled over a SUBSET mesh
            # (trainer.devices < len(jax.devices())) then fails at call time
            # ("expected args to have N shards"). Pin the example args' own
            # mesh devices — the same assignment the compile used.
            exec_devices = None
            for leaf in jtu.tree_leaves(args):
                mesh = getattr(getattr(leaf, "sharding", None), "mesh", None)
                if mesh is not None:
                    exec_devices = list(mesh.devices.flat)
                    break
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            compiled = deserialize_and_load(payload, in_tree, out_tree,
                                            execution_devices=exec_devices)
            logger.info("aot cache HIT: %s (%.1f MB) — compile skipped",
                        path.name, path.stat().st_size / 1e6)
            return compiled, "hit"
        except Exception as e:  # stale/foreign blob: recompile below
            logger.warning("aot cache blob %s unusable (%s: %s); recompiling",
                           path.name, type(e).__name__, e)

    compiled = jitted.lower(*args).compile()
    try:
        from jax.experimental.serialize_executable import serialize
        payload, _, _ = serialize(compiled)
        # atomic publish: a SIGTERM mid-write must not leave a torn blob
        fd, tmp = tempfile.mkstemp(dir=str(cache_dir), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump({"payload": payload}, f)
        os.replace(tmp, path)
        logger.info("aot cache MISS: compiled and saved %s (%.1f MB)",
                    path.name, path.stat().st_size / 1e6)
        return compiled, "miss"
    except Exception as e:
        logger.warning("aot serialization unavailable (%s: %s); "
                       "running without blob", type(e).__name__, e)
        return compiled, "miss-nosave"
