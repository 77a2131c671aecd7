"""Device mesh + sharding helpers.

The reference's only training parallelism is DDP data-parallel over 4 GPUs
(NCCL; `mdt/training.py:74-77`, SURVEY §2.10). The TPU-native equivalent is a
1-D `data` mesh: batches are sharded on their leading axis, parameters are
replicated, and XLA compiles the gradient psum AND the contrastive-loss
all-gather (the `use_distributed_clip` path, mdtv_agent.py:458-465) into the
same program over ICI. No explicit collectives appear in model code.

The model is tens of millions of parameters (SURVEY §2.10: TP/PP/SP/EP not
needed) — replication is the right layout; the mesh generalizes to multi-host
by passing `jax.devices()` spanning hosts.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate_tree", "DATA_AXIS"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for batch arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place every leaf with its leading dim sharded over the data axis.

    Multi-host: each process passes its LOCAL slice of the global batch (the
    loader's shard_index/num_shards slicing); the global array is assembled
    from per-process shards without any cross-host transfer."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh. Multi-host: every process must
    hold identical values (same init seed), which the deterministic seeded
    init guarantees."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
