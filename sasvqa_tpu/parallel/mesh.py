"""Device mesh + sharding helpers.

TPU-native replacement for the reference's (commented-out) Horovod data
parallelism (src/utils/distributed.py, SURVEY.md §2.2): one jitted
program over a ``jax.sharding.Mesh``, batch sharded on the ``data``
axis, parameters replicated (ViT-B/L fit per chip), XLA inserting the
gradient psum over ICI.  A second optional ``fsdp`` axis shards params
for larger models.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              shape: Optional[Sequence[int]] = None,
              axes: Optional[Sequence[str]] = None,
              platform: Optional[str] = None) -> Mesh:
    """Build a mesh; default = all devices on one data axis.

    ``platform`` selects a backend explicitly ("cpu" for the 8-virtual-
    device test harness); when ``shape`` is given, devices are sliced to
    prod(shape)."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    axes = tuple(axes) if axes else (DATA_AXIS,)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    assert len(shape) == len(axes), (
        f"mesh shape {tuple(shape)} has {len(shape)} dims but axes "
        f"{axes} name {len(axes)} — pass matching --mesh_shape/"
        f"--mesh_axes")
    n = int(np.prod(shape))
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_batch_positions(mesh: Mesh, global_rows: int,
                         process_index: Optional[int] = None) -> np.ndarray:
    """Sorted row positions of a P('data')-sharded global batch that
    THIS process must supply (the general multi-host input assignment).

    ``jax.make_array_from_process_local_data`` maps each process's
    local rows positionally onto its sorted addressable indices, and
    requires replica processes to supply identical data.  Deriving the
    positions from the sharding itself makes input loading correct for
    ANY host/mesh-axis alignment:

    - hosts aligned with the data axis (the common pod layout: model/
      fsdp axes inside a host) reduce to the contiguous block
      ``[pi*rows, (pi+1)*rows)`` — the behavior the old stride split
      produced up to within-batch order;
    - hosts that straddle a non-data axis (e.g. 1 chip/host on a
      (data=2, fsdp=2) mesh) become REPLICAS: both supply the same
      rows, which the caller must fill with the same samples.

    Raises on meshes where two processes' row sets partially overlap
    (only constructible with exotic device orders): per-row sample
    content would be well-defined, but batch-seeded collator RNG could
    not be made consistent between the overlapping hosts.
    """
    import jax
    pi = jax.process_index() if process_index is None else process_index
    idx_map = batch_sharding(mesh).devices_indices_map((global_rows,))
    per_proc: dict = {}
    for dev, idx in idx_map.items():
        sl = idx[0]
        span = (sl.start or 0,
                global_rows if sl.stop is None else sl.stop)
        per_proc.setdefault(dev.process_index, set()).add(span)

    def rows(spans):
        return np.unique(np.concatenate(
            [np.arange(a, b) for a, b in sorted(spans)]))

    mine = rows(per_proc[pi])
    mine_set = set(mine.tolist())
    for other_pi, spans in per_proc.items():
        if other_pi == pi:
            continue
        other = set(rows(spans).tolist())
        inter = mine_set & other
        if inter and not (inter == mine_set == other):
            raise ValueError(
                f"processes {pi} and {other_pi} address partially "
                "overlapping batch rows under this mesh; reorder the "
                "mesh axes so hosts are replicas or disjoint on the "
                "data axis")
    return mine


def shard_batch(batch: Any, mesh: Mesh, micro_axis: bool = False) -> Any:
    """device_put a host batch pytree with the batch axis sharded on
    ``data``.  Non-array leaves pass through.

    ``micro_axis``: leaves are K-stacked (K, B, ...) for the scan
    accumulation step — the data axis is dim 1 (P(None, 'data')) and
    every device holds the whole micro axis.

    Multi-host: each host holds only its per-host slice of the global
    batch (epoch_batches shards sample indices by process), so the
    global array is assembled from process-local shards."""
    spec = P(None, DATA_AXIS) if micro_axis else P(DATA_AXIS)
    sharding = NamedSharding(mesh, spec)
    multihost = jax.process_count() > 1
    min_ndim = 2 if micro_axis else 1

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= min_ndim:
            if multihost:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            return jax.device_put(x, sharding)
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            # a sub-micro-rank leaf in a stacked batch would be
            # PER-HOST data; replicating it multi-host would silently
            # diverge across processes — refuse rather than guess
            if multihost:
                raise ValueError(
                    f"cannot shard rank-{x.ndim} leaf in micro_axis "
                    f"mode on a multi-host mesh; stack it to (K, ...)")
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree_util.tree_map(put, batch)


def fsdp_leaf_sharding(leaf, mesh: Mesh, axis_name: str, n_shard: int,
                       min_size: int) -> NamedSharding:
    """The ONE per-leaf ZeRO rule: shard a large >=2D param on its
    largest axis over ``axis_name`` when divisible, else replicate.
    Shared by fsdp_param_sharding and tp.tp_param_sharding's fallback
    so the policy cannot drift between '--mesh_axes data fsdp' and
    'data fsdp model' (r3 review finding)."""
    if getattr(leaf, "ndim", 0) >= 2 and leaf.size >= min_size:
        axis = int(np.argmax(leaf.shape))
        if leaf.shape[axis] % n_shard == 0:
            spec = [None] * leaf.ndim
            spec[axis] = axis_name
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_param_sharding(params: Any, mesh: Mesh,
                        min_size: int = 2 ** 16) -> Any:
    """Per-leaf NamedSharding tree: shard each large >=2D param on its
    largest axis over the ``fsdp`` mesh axis (must divide evenly);
    everything else replicates.  XLA inserts the all-gathers/reduce-
    scatters — ZeRO-3-style FSDP without manual collectives."""
    assert FSDP_AXIS in mesh.axis_names, mesh.axis_names
    n_shard = mesh.shape[FSDP_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: fsdp_leaf_sharding(leaf, mesh, FSDP_AXIS, n_shard,
                                        min_size), params)


def param_sharding_for_mesh(params: Any, mesh: Optional[Mesh],
                            min_size: int = 2 ** 16) -> Optional[Any]:
    """Sharding tree implied by the mesh's axis names, or None when the
    mesh is data-only (params replicated — the common case).

    ``--mesh_axes data fsdp``        -> ZeRO-3 param sharding
    ``--mesh_axes data model``       -> Megatron tensor parallelism
    ``--mesh_axes data fsdp model``  -> TP + ZeRO on the other dim
    This is the single dispatch point the task entry uses, so the CLI
    mesh flags fully select the parallelism strategy."""
    if mesh is None:
        return None
    names = mesh.axis_names
    has = lambda a: a in names and mesh.shape[a] > 1
    if has("model"):
        from sasvqa_tpu.parallel.tp import tp_param_sharding
        return tp_param_sharding(params, mesh,
                                 fsdp_axis="fsdp" if has("fsdp") else None,
                                 min_size=min_size)
    if has("fsdp"):
        return fsdp_param_sharding(params, mesh, min_size=min_size)
    return None


def fetch_params_for_save(params: Any, mesh: Optional[Mesh]) -> Any:
    """Host copy of (possibly sharded) params for an eval snapshot.

    The host copy is load-bearing: eval snapshots save asynchronously
    while the next train step DONATES the param buffers, so the saver
    must not hold device references.  On one host jax.device_get works
    for any local sharding; on a pod, fsdp/model-sharded leaves span
    non-addressable devices, so replicate first with a jitted identity
    (XLA inserts the all-gathers over ICI)."""
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.jit(lambda x: x,
                         out_shardings=jax.tree_util.tree_map(
                             lambda _: rep, params))(params)
    return jax.device_get(params)


import functools


@functools.lru_cache(maxsize=8)
def _replicator(mesh: Mesh):
    # cached per mesh: a fresh jax.jit per call would never hit the jit
    # cache and retrace the identity all-gather for every eval batch
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda a: a, out_shardings=rep)


def fetch_replicated(x: Any, mesh: Optional[Mesh]) -> np.ndarray:
    """Host copy of a (possibly cross-host-sharded) array.

    Single process: plain fetch.  Multi-host: a jitted identity with a
    replicated out_sharding first (XLA all-gathers the shards over ICI),
    so every process can read the FULL array — the eval loop uses this
    to give all hosts identical per-batch outputs (predictions are tiny:
    ints/logit rows, never activations)."""
    if mesh is not None and jax.process_count() > 1:
        x = _replicator(mesh)(x)
    return np.asarray(x)


def pad_batch_to_multiple(batch: Any, multiple: int) -> Any:
    """Pad the leading axis of every array leaf to a multiple of the data
    axis size (uneven final batches would otherwise fail to shard).
    Padded labels are set to -100 so they drop out of loss/metrics.

    Library utility: validate() no longer calls it — its batch plan
    tiles INDICES to a full final batch instead (eval_batch_plan), which
    keeps prediction attribution positional.  Kept for external callers
    that shard ad-hoc batches over a mesh (bench.py documents the same
    divisibility rule)."""
    def pad(x, value=0):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, constant_values=value)

    out = {}
    for k, v in batch.items():
        if k == "labels" and v is not None:
            out[k] = pad(v, -100)
        elif hasattr(v, "shape"):  # any array-like (np/jnp), like pad()
            out[k] = pad(v)
        else:
            out[k] = v
    return out
