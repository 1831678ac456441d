"""Device mesh + sharding helpers (the explicit parallelism layer).

The reference is single-device (SURVEY.md §2.9); this module adds first-class
data parallelism the TPU way: a ``jax.sharding.Mesh`` over the local (and,
for multi-slice deployments, DCN-connected) devices, batch-dim
``NamedSharding`` on inputs, replicated parameters (optionally a row-sharded
series-embedding table for high-cardinality runs), and XLA-inserted gradient
all-reduce over ICI. No explicit collectives are needed — jit sees the
shardings and does the rest.

Mesh layouts:

- 1-D ``("data",)`` — single-slice data parallelism over ICI (the default).
- 2-D ``("dcn", "data")`` — multi-slice: the batch is sharded over both axes
  (outer axis rides DCN, inner axis rides ICI), parameters stay replicated
  per slice so the gradient all-reduce is hierarchical (XLA reduces over ICI
  first, then across DCN). On a real multi-slice deployment the mesh comes
  from ``mesh_utils.create_hybrid_device_mesh``; single-process (and the
  virtual CPU mesh used in tests) falls back to a reshape of local devices.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = DATA_AXIS,
    dcn_slices: int = 1,
) -> Mesh:
    """Build the data-parallel mesh.

    ``dcn_slices > 1`` produces a 2-D ``(dcn, data)`` mesh: on a multi-process
    (multi-slice) runtime the device grid comes from
    ``mesh_utils.create_hybrid_device_mesh`` so the outer axis maps onto DCN;
    otherwise the local devices are reshaped (virtual-mesh testing).
    """

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    dcn_slices = max(1, int(dcn_slices))
    if dcn_slices == 1:
        return Mesh(np.asarray(devices), (axis,))
    if len(devices) % dcn_slices != 0:
        raise ValueError(
            f"{len(devices)} devices cannot be split into {dcn_slices} DCN slices"
        )
    per_slice = len(devices) // dcn_slices
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        # Granule selection: real multi-slice TPU deployments group devices
        # by their ``slice_index`` attribute; backends whose slice_index is
        # missing or degenerate (CPU multi-process runs report 0 everywhere;
        # single-slice pods driven by >1 process) must group by process
        # instead — create_hybrid_device_mesh otherwise sees ONE slice and
        # rejects the dcn shape (found by the two-process CPU test,
        # VERDICT r3 #5).
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        use_slices = None not in slice_ids and len(slice_ids) == dcn_slices
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_slice),
            dcn_mesh_shape=(dcn_slices, 1),
            devices=devices,
            process_is_granule=not use_slices,
        )
        return Mesh(grid.reshape(dcn_slices, per_slice), (DCN_AXIS, axis))
    return Mesh(
        np.asarray(devices).reshape(dcn_slices, per_slice), (DCN_AXIS, axis)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across every mesh axis."""

    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a 2-D [vocab, dim] table across every mesh axis."""

    return NamedSharding(mesh, P(tuple(mesh.axis_names), None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded.

    Arrays whose leading dim is not divisible by the mesh size are
    replicated instead (scalars, per-series tables, etc.).

    Multi-process runtimes (``jax.process_count() > 1``) cannot
    ``device_put`` a host array against a sharding that spans non-addressable
    devices; there each host contributes its shard via
    ``jax.make_array_from_process_local_data``, which assumes the host array
    is the full GLOBAL batch (every host loads the same windows — correct
    for this pipeline, whose batcher is seeded identically on every host)
    and slices out this process's rows.
    """

    n = mesh.devices.size
    spec_b = batch_sharding(mesh)
    spec_r = replicated(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0 and arr.shape[0] > 0:
            if multiprocess:
                local = _local_rows(arr, spec_b)
                return jax.make_array_from_process_local_data(
                    spec_b, local, arr.shape
                )
            return jax.device_put(arr, spec_b)
        if multiprocess:
            return jax.make_array_from_process_local_data(spec_r, arr, arr.shape)
        return jax.device_put(arr, spec_r)

    return jax.tree_util.tree_map(put, tree)


def _local_rows(arr: np.ndarray, sharding: NamedSharding) -> np.ndarray:
    """Rows of the global batch owned by this process under ``sharding``."""

    rows = sorted(
        {
            idx[0].indices(arr.shape[0])
            for d, idx in sharding.devices_indices_map(arr.shape).items()
            if d.process_index == jax.process_index()
        }
    )
    return np.concatenate([arr[start:stop:step] for start, stop, step in rows])


def host_fetch(tree: Any) -> Any:
    """``jax.device_get`` that also works for cross-process sharded leaves.

    Single-process: plain device_get. Multi-process: non-fully-addressable
    leaves (e.g. the row-sharded series-embedding table) are allgathered
    across processes first so every host gets the assembled global array —
    required by the checkpoint/save paths (VERDICT r2 #5).
    """

    if jax.process_count() == 1:
        return jax.device_get(tree)

    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(fetch, tree)


def _copy_leaf(a):
    # dtype-preserving forced computation: `a + 0` would weak-type-promote
    # bool -> int32 leaves; xor keeps bool, a typed zero keeps the rest.
    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.bool_):
        return jnp.logical_xor(a, False)
    return a + jnp.zeros((), jnp.asarray(a).dtype)


@jax.jit
def _copy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(_copy_leaf, tree)


def device_snapshot(tree: Any) -> Any:
    """Donation-safe on-device copy of a (possibly sharded) pytree.

    Jitted identity: outputs are fresh buffers (safe against later donation
    of the source state) with shardings propagated from the inputs, and the
    copy stays in HBM — no host round-trip. Lets the training loop keep its
    best-params snapshot on device and ``host_fetch`` it once at the end
    instead of pulling the full parameter tree through the relay on every
    improving epoch.
    """

    return _copy_tree(tree)


def put_global(x: Any, sharding: NamedSharding) -> Any:
    """Place one host array on the mesh under ``sharding``, multi-process-safe.

    Single-process: plain ``device_put``. Multi-process: a raw ``device_put``
    against a cross-process NamedSharding is invalid, so build the global
    array from per-shard callbacks — every process holds the full host array
    (the data/plan pipelines are deterministic per process), so any
    PartitionSpec (replicated, row-sharded batches, dim-1-sharded epoch
    plans) works without per-spec slicing math.
    """

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(jax.device_get(x))
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


_put_global = put_global  # internal alias (pre-rename call sites)


def replicate(mesh: Mesh, tree: Any) -> Any:
    spec = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, spec), tree)


def sync_frozen_spec(spec, n_layers: int, k: int):
    """Make the freeze-periods decision globally consistent under DP.

    On a multi-process runtime every process derives the frozen-period spec
    from its own telemetry probe; if any process disagreed (different probe
    rows, nondeterministic reductions), the processes would compile DIFFERENT
    specialized programs and deadlock in the gradient all-reduce. Broadcast
    process 0's snapshot so every downstream freeze/drift decision is a pure
    function of one global spec sequence (VERDICT r4 #3).

    Must be called by EVERY process at the same point in the epoch loop (it
    is a collective). Single-process: identity, zero cost. ``spec`` is the
    hashable per-layer tuple from ``Engine.frozen_spec_from_telemetry`` or
    ``None``; both encode into one fixed-shape int32 vector.
    """

    if jax.process_count() == 1:
        return spec

    from jax.experimental import multihost_utils

    n_vals = int(n_layers) * int(k) * 3
    enc = np.zeros((1 + n_vals,), np.int32)
    if spec is not None:
        flat = [int(v) for layer in spec for slot in layer for v in slot]
        # a spec whose slot count disagrees with k cannot encode — broadcast
        # "no spec" so every process stays on the dynamic path together
        if len(flat) == n_vals:
            enc[0] = 1
            enc[1:] = np.asarray(flat, np.int32)
    out = np.asarray(multihost_utils.broadcast_one_to_all(enc))
    if int(out[0]) != 1:
        return None
    vals = out[1:].reshape(int(n_layers), int(k), 3)
    return tuple(
        tuple((int(p), int(f), bool(v)) for p, f, v in layer) for layer in vals
    )


def _path_names(path) -> tuple:
    return tuple(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)


def shard_train_state(
    mesh: Mesh,
    state: Any,
    *,
    shard_tables: bool = False,
    table_name: str = "series_embedding",
) -> Any:
    """Place a TrainState on the mesh: replicate everything, optionally
    row-sharding the series-embedding table (and its optimizer moments, which
    mirror the param tree) for high-cardinality runs (BASELINE config #5).

    Tables whose row count does not divide the mesh size stay replicated.
    """

    n = mesh.devices.size
    spec_r = replicated(mesh)
    spec_t = table_sharding(mesh)

    def put(path, leaf):
        if leaf is None:
            return None
        if (
            shard_tables
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] % n == 0
            and table_name in _path_names(path)
        ):
            return _put_global(leaf, spec_t)
        return _put_global(leaf, spec_r)

    return jax.tree_util.tree_map_with_path(put, state)
