"""Device-mesh helpers.

The reference trains on a single CUDA device (Cluster/utils.py:190-200
`set_device`) with distributed training deferred to an absent `dev_ddp`
branch (readme.md:65). Here scaling is first-class: a 1-D ``data`` mesh over
all addressable devices, batches sharded along it, and gradient reductions
inserted by XLA via `jit` + `NamedSharding` (collectives ride ICI).

These helpers are the single place the rest of the framework touches device
topology; everything else stays pure and mesh-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` so
    `jax.devices()` spans all hosts' chips (SURVEY.md §5 'Distributed
    communication backend'). On TPU pods the arguments auto-discover from
    the environment; pass them explicitly elsewhere (extra kwargs — e.g.
    `local_device_ids` on CPU clusters — pass through). Idempotent."""
    import jax.distributed as jdist

    try:
        jdist.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        # jax wordings vary by version: "already initialized" and
        # "should only be called once" both mean a prior successful init
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


DCN_AXIS = "dcn"


def make_data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def make_multislice_mesh(
    n_slices: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (dcn, data) mesh for multi-slice pods: the outer axis crosses
    slices over DCN, the inner axis rides ICI within a slice. Batches
    shard over BOTH axes (data parallelism is the only parallelism this
    workload needs — SURVEY.md §2.2), so gradient psums reduce
    hierarchically: ICI within slices first, one small cross-slice hop
    over DCN.

    Device order follows jax.devices(), which groups by slice on
    multi-slice TPU deployments.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) % n_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices"
        )
    grid = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(grid, axis_names=(DCN_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over EVERY mesh axis; replicate the
    rest. On a 1-D mesh that is plain DP over ICI; on a (dcn, data)
    multi-slice mesh the batch splits across slices too and XLA reduces
    gradients hierarchically (ICI within slices, one DCN hop across)."""
    spec = P(tuple(mesh.axis_names), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Place a host batch on the mesh, sharded along the batch axis.

    The batch's leading dim must divide evenly by the mesh size — callers pad
    with `pad_to_multiple` and mask, keeping shapes static for XLA.
    """
    if batch.shape[0] % mesh.devices.size != 0:
        raise ValueError(
            f"batch dim {batch.shape[0]} not divisible by mesh size "
            f"{mesh.devices.size}; pad first (pad_to_multiple)."
        )
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim))
