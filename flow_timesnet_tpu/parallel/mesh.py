"""Device mesh + sharding helpers (the explicit parallelism layer).

The reference is single-device (SURVEY.md §2.9); this module adds first-class
data parallelism the TPU way: a 1-D ``jax.sharding.Mesh`` over all local
devices, batch-dim ``NamedSharding`` on inputs, replicated parameters, and
XLA-inserted gradient all-reduce over ICI. No explicit collectives are
needed — jit sees the shardings and does the rest.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """Build a 1-D mesh over the first ``n_devices`` local devices."""

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""

    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded.

    Arrays whose leading dim is not divisible by the mesh size are
    replicated instead (scalars, per-series tables, etc.).
    """

    n = mesh.devices.size
    spec_b = batch_sharding(mesh, axis)
    spec_r = replicated(mesh)

    def put(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0 and arr.shape[0] > 0:
            return jax.device_put(arr, spec_b)
        return jax.device_put(arr, spec_r)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    spec = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)
