"""Device-resident batched data layout.

The dataset (M, H, W, C) is padded to a whole number of fixed-size batches
and reshaped to (n_batches, batch, H, W, C) with a (n_batches, batch) mask
marking real samples. Iteration order is the identity (the reference never
shuffles its loaders, production.py:131-145 — the DEC stale-p slicing at
models.py:1113-1114 depends on it), so sample i of the flat dataset is at
[i // batch, i % batch].

On a mesh, the array is sharded along the *within-batch* axis
(PartitionSpec(None, 'data', ...)): a `lax.scan` over the leading axis then
yields per-step batches already sharded for data parallelism, and XLA
inserts the gradient psums.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class BatchedData:
    x: jax.Array          # (NB, B, H, W, C)
    mask: jax.Array       # (NB, B) 1.0 for real samples
    n_samples: int        # M (unpadded)
    batch_size: int

    @property
    def n_batches(self) -> int:
        return self.x.shape[0]

    def flat_mask(self) -> jax.Array:
        return self.mask.reshape(-1)


def batched_sharding(mesh: Optional[Mesh], ndim: int) -> Optional[NamedSharding]:
    """Within-batch axis sharded over EVERY mesh axis — on a 1-D mesh that
    is plain DP over ICI; on a (dcn, data) multi-slice mesh the batch
    splits across slices too and XLA reduces gradients hierarchically."""
    if mesh is None:
        return None
    axes = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(None, axes, *([None] * (ndim - 2))))


def process_block(sharding: NamedSharding, global_shape, axis: int):
    """[lo, hi) span of `axis` whose shards live on THIS process.

    Multi-host feeding (SURVEY.md §5 'Distributed communication backend'):
    each host materializes only its addressable block and the global array
    is assembled with `jax.make_array_from_process_local_data`. Derived
    from the sharding's own addressable-device index map, so it is correct
    for any mesh layout that keeps a process's shards contiguous (the
    jax.devices() process-major ordering guarantees this for our meshes).
    """
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    starts, stops = [], []
    for idx in idx_map.values():
        sl = idx[axis]
        starts.append(sl.start or 0)
        stop = sl.stop if sl.stop is not None else global_shape[axis]
        stops.append(stop)
    lo, hi = min(starts), max(stops)
    n_dev = len(idx_map)
    if (hi - lo) * len(sharding.device_set) != global_shape[axis] * n_dev:
        raise ValueError(
            f"process shards of axis {axis} are not contiguous under "
            f"{sharding}; cannot feed process-locally"
        )
    return lo, hi


def put_process_local(
    x_host: np.ndarray, sharding: Optional[NamedSharding], axis: int
):
    """Place a host array on devices, feeding only this process's block.

    `x_host` is the GLOBAL array as materialized on this host (every host
    computes/reads the same global layout; only the local block is
    transferred). On one process this equals `jax.device_put(x, sharding)`;
    on a pod each host feeds its own shards and the result is one global
    jax.Array spanning all hosts.
    """
    if sharding is None:
        return jnp.asarray(x_host)
    if sharding.is_fully_addressable:
        return jax.device_put(x_host, sharding)
    lo, hi = process_block(sharding, x_host.shape, axis)
    local = x_host[(slice(None),) * axis + (slice(lo, hi),)]
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), x_host.shape
    )


def fetch_global(tree):
    """`jax.device_get` that also works for arrays sharded across
    processes: such leaves are all-gathered to every process first (jitted
    identity with a fully-replicated out sharding), so every host receives
    the GLOBAL value. Fully-addressable or replicated leaves fetch
    directly. Use at host boundaries (cluster init, history/label export,
    figure snapshots) — never inside a hot loop."""

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            mesh = getattr(x.sharding, "mesh", None)
            if mesh is None:
                # non-Named shardings (GSPMD/positional from library
                # code) carry no mesh; gather across processes the
                # portable way instead of AttributeError-ing at the
                # host boundary the fetch exists to protect
                from jax.experimental import multihost_utils

                return multihost_utils.process_allgather(x, tiled=True)
            repl = NamedSharding(mesh, P())
            # one cached jitted identity per target sharding: a fresh
            # jax.jit object per call would miss the jit cache (keyed on
            # function identity) and re-trace on every fetch — hundreds
            # of times per DEC refresh in full_eval_stream
            fn = _GATHER_FNS.get(repl)
            if fn is None:
                if len(_GATHER_FNS) >= 8:
                    # bound the cache: each entry pins its Mesh + compiled
                    # executable for process lifetime (sessions that build
                    # many meshes — sweeps, tests — would accumulate)
                    _GATHER_FNS.pop(next(iter(_GATHER_FNS)))
                fn = _GATHER_FNS[repl] = jax.jit(
                    lambda a: a, out_shardings=repl
                )
            return fn(x)
        return x

    return jax.device_get(jax.tree.map(gather, tree))


_GATHER_FNS: dict = {}


def make_batched_data(
    x: np.ndarray,
    batch_size: int,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
) -> BatchedData:
    """Pad + reshape host samples (M, H, W, C) into device-resident batches.

    With a mesh, batch_size must be divisible by the mesh size.
    """
    if mesh is not None and batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide evenly over the "
            f"{mesh.devices.size}-device mesh"
        )
    m = x.shape[0]
    if m == 0:
        # fabricating one all-padding batch would report a silent 0.0
        # loss (or NaN for mean-by-n_valid consumers) — fail loudly like
        # prefetch._iter_process_local does for the same hazard
        raise ValueError("make_batched_data got an empty sample array")
    nb = -(-m // batch_size)
    pad = nb * batch_size - m
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    mask = np.zeros((nb * batch_size,), np.float32)
    mask[:m] = 1.0
    # copy=False: the pad concat above already duplicated the data once;
    # a dtype-matching astype copy would put a second full-dataset copy
    # at the host-RAM peak
    xb = x.reshape(nb, batch_size, *x.shape[1:]).astype(dtype, copy=False)
    mb = mask.reshape(nb, batch_size)

    if mesh is not None:
        # axis 1 (within-batch) is the sharded axis; on a multi-host mesh
        # each process transfers only its own block (put_process_local)
        xb = put_process_local(xb, batched_sharding(mesh, xb.ndim), axis=1)
        mb = put_process_local(mb, batched_sharding(mesh, 2), axis=1)
    else:
        xb, mb = jnp.asarray(xb), jnp.asarray(mb)
    return BatchedData(x=xb, mask=mb, n_samples=m, batch_size=batch_size)
