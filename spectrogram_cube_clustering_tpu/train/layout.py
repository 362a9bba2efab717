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

from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS


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
    nb = max(-(-m // batch_size), 1)
    pad = nb * batch_size - m
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    mask = np.zeros((nb * batch_size,), np.float32)
    mask[:m] = 1.0
    xb = x.reshape(nb, batch_size, *x.shape[1:]).astype(dtype)
    mb = mask.reshape(nb, batch_size)

    if mesh is not None:
        xb = jax.device_put(xb, batched_sharding(mesh, xb.ndim))
        mb = jax.device_put(mb, batched_sharding(mesh, 2))
    else:
        xb, mb = jnp.asarray(xb), jnp.asarray(mb)
    return BatchedData(x=xb, mask=mb, n_samples=m, batch_size=batch_size)
