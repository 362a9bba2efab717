"""Chunked on-device silhouette scores.

Replaces the reference's sklearn/cuML `silhouette_samples`
(Cluster/models.py:293-297, 1271-1299). The O(M^2) pairwise-distance matrix
never materializes: a `lax.scan` walks row chunks, and per-cluster distance
sums reduce through a (chunk, M) @ (M, K) matmul on the MXU.

Euclidean metric, matching sklearn's default. s(i) = (b-a)/max(a,b) with
a = mean intra-cluster distance (excluding self), b = min over other
clusters of mean distance; singleton clusters score 0 (sklearn convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("n_clusters", "chunk"))
def _silhouette_jit(x, labels, n_clusters, chunk):
    m, _ = x.shape
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)   # (M, K)
    counts = jnp.sum(onehot, axis=0)                             # (K,)
    x2 = jnp.sum(x * x, axis=1)                                  # (M,)

    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    x2p = jnp.pad(x2, (0, pad))
    labels_p = jnp.pad(labels, (0, pad))

    def body(_, idx):
        rows = lax.dynamic_slice_in_dim(xp, idx, chunk)          # (c, D)
        rows2 = lax.dynamic_slice_in_dim(x2p, idx, chunk)
        lrows = lax.dynamic_slice_in_dim(labels_p, idx, chunk)
        # full f32 matmuls: the distance expansion cancels catastrophically
        # under the MXU's reduced default precision
        prod = jnp.matmul(rows, x.T, precision=lax.Precision.HIGHEST)
        d2 = rows2[:, None] - 2.0 * prod + x2[None, :]           # (c, M)
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        sums = jnp.matmul(d, onehot, precision=lax.Precision.HIGHEST)  # (c, K)
        own = jax.nn.one_hot(lrows, n_clusters, dtype=x.dtype)   # (c, K)
        own_count = own @ counts                                 # (c,)
        a = jnp.sum(sums * own, axis=1) / jnp.maximum(own_count - 1.0, 1.0)
        mean_other = jnp.where(
            (own == 0) & (counts[None, :] > 0),
            sums / jnp.maximum(counts[None, :], 1.0),
            jnp.inf,
        )
        b = jnp.min(mean_other, axis=1)
        s = (b - a) / jnp.maximum(jnp.maximum(a, b), jnp.finfo(x.dtype).tiny)
        s = jnp.where(own_count <= 1.0, 0.0, s)                  # singletons
        return None, s

    _, out = lax.scan(body, None, jnp.arange(n_chunks) * chunk)
    return out.reshape(-1)[:m]


def silhouette_samples(x, labels, n_clusters: int, *, chunk: int = 2048):
    """Per-sample silhouette scores for x (M, D), labels (M,)."""
    import numpy as np

    labels = jnp.asarray(labels)
    present = int(np.unique(np.asarray(labels)).size)
    if not 1 < present <= len(np.asarray(labels)) - 1:
        # with one populated cluster b = min over OTHER clusters = inf,
        # which would silently turn every score into NaN downstream
        # (cluster_performance.csv, cluster_stats.csv); sklearn raises
        # here too, and a collapsed fit should be loud
        raise ValueError(
            f"silhouette requires 2 to n_samples-1 populated clusters, "
            f"got {present}"
        )
    x = jnp.asarray(x)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    if x.ndim != 2:
        x = x.reshape(x.shape[0], -1)
    return _silhouette_jit(x, labels, n_clusters, chunk)
