"""Batched k-means with vmapped restarts.

Reference contract (Cluster/models.py:546-574 / 386-391): sklearn/cuML
KMeans(n_clusters, max_iter=1000, n_init=100, random_state=2009) — 100
independent k-means++ restarts, best inertia wins. Naively porting that is
100 sequential fits; here all restarts run simultaneously under one jit
(`vmap` over the restart axis), with a shared `lax.while_loop` that stops
when every restart has converged (SURVEY.md §7 "hard parts").

Parity is statistical, not bitwise: JAX PRNG != sklearn's MT19937, so
individual labels may permute, but on separable data the best-restart
solution matches sklearn to NMI/ARI >= 0.99 (tests/test_cluster.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


from spectrogram_cube_clustering_tpu.ops.student_t import (
    pairwise_sqdist as _sqdist,  # shared difference form (stable at small D)
)


def _plus_plus_init(key: jax.Array, z: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding (one candidate per step)."""
    m = z.shape[0]
    key, k0 = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, m)
    centers = jnp.zeros((k, z.shape[1]), z.dtype).at[0].set(z[first])
    d2 = jnp.sum((z - z[first]) ** 2, axis=-1)
    tiny = jnp.finfo(z.dtype).tiny

    def body(i, carry):
        key, centers, d2 = carry
        key, sub = jax.random.split(key)
        idx = jax.random.categorical(sub, jnp.log(jnp.maximum(d2, tiny)))
        c = z[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((z - c) ** 2, axis=-1))
        return key, centers, d2

    _, centers, _ = lax.fori_loop(1, k, body, (key, centers, d2))
    return centers


def _lloyd_single(z, init_centers, max_iter, tol_abs):
    """One restart's Lloyd iterations; vmapped over restarts by `kmeans`."""
    k = init_centers.shape[0]

    def assign(centers):
        d2 = _sqdist(z, centers)
        labels = jnp.argmin(d2, axis=-1)
        inertia = jnp.sum(jnp.min(d2, axis=-1))
        return labels, inertia

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        centers, _, it, _ = state
        labels, _ = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=z.dtype)      # (M, K)
        counts = jnp.sum(onehot, axis=0)                        # (K,)
        sums = onehot.T @ z                                     # (K, D) on MXU
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        shift = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift, it + 1, shift <= tol_abs

    init = (init_centers, jnp.inf, jnp.array(0), jnp.array(False))
    centers, _, n_iter, _ = lax.while_loop(cond, body, init)
    labels, inertia = assign(centers)
    return centers, labels, inertia, n_iter


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "n_init", "max_iter", "restart_chunk"),
)
def _kmeans_jit(z, key, n_clusters, n_init, max_iter, tol_abs, restart_chunk):
    # Restarts run `restart_chunk` at a time (vmap inside lax.map): each
    # live restart holds O(M*K) working buffers, so fully vmapping 100
    # restarts at cube scale would overflow HBM.
    keys = jax.random.split(key, n_init)
    chunk = min(restart_chunk, n_init)
    n_chunks = -(-n_init // chunk)
    pad = n_chunks * chunk - n_init
    keys = jnp.concatenate([keys, keys[:1].repeat(pad, 0)]) if pad else keys

    def run_chunk(kc):
        inits = jax.vmap(lambda k: _plus_plus_init(k, z, n_clusters))(kc)
        centers, _, inertia, _ = jax.vmap(
            lambda c: _lloyd_single(z, c, max_iter, tol_abs)
        )(inits)
        return centers, inertia

    centers, inertia = jax.lax.map(
        run_chunk, keys.reshape(n_chunks, chunk, *keys.shape[1:])
    )
    centers = centers.reshape(-1, n_clusters, z.shape[1])[:n_init]
    inertia = inertia.reshape(-1)[:n_init]
    best = jnp.argmin(inertia)
    best_centers = centers[best]
    # final assignment for the winning restart only
    d2 = _sqdist(z, best_centers)
    return jnp.argmin(d2, axis=-1), best_centers, inertia[best]


def kmeans(
    z_array,
    n_clusters: int,
    *,
    n_init: int = 100,
    max_iter: int = 1000,
    tol: float = 1e-4,
    seed: int = 2009,
    restart_chunk: int = 16,
    return_inertia: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Cluster rows of z_array (M, D) into n_clusters.

    Returns (labels (M,), centroids (K, D)) like models.py:546-574 — or
    (labels, centroids, inertia) with `return_inertia=True`, exposing the
    winning restart's within-cluster dispersion the fit already computed
    (gap_statistic consumes it instead of re-deriving inertia with a full
    (M, K, D) host broadcast). Defaults mirror the reference call sites
    (n_init=100, max_iter=1000, seed=2009); `tol` follows sklearn
    semantics (relative to the mean per-feature variance of the data).
    """
    z = jnp.asarray(z_array)
    if z.dtype not in (jnp.float32, jnp.float64):
        z = z.astype(jnp.float32)
    tol_abs = tol * jnp.mean(jnp.var(z, axis=0))
    labels, centers, inertia = _kmeans_jit(
        z, jax.random.key(seed), n_clusters, n_init, max_iter, tol_abs,
        restart_chunk,
    )
    if return_inertia:
        return labels, centers, inertia
    return labels, centers
