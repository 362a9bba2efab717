"""Distributed clustering primitives: psum-reduced sufficient statistics.

The reference's k-means/GMM run single-device via sklearn/cuML
(Cluster/models.py:365-413). At cube scale the latent matrix is sharded
across the data mesh; one Lloyd / EM step then needs only two global
reductions — per-cluster sums and counts — expressed as `psum` inside
`shard_map` (SURVEY.md §5 "Distributed communication backend": the same
pattern carries GMM-EM responsibilities).

Ragged catalogs are handled internally: inputs whose length does not
divide the mesh are zero-padded and the pad rows masked out of every
sufficient statistic, so callers (workflow/fit.py's mesh path) never
need their own padding. The `shard_map`'d step functions are built once
per mesh (lru_cache) so iteration loops neither retrace nor re-transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS


def _sqdist(z, centers):
    """Squared distances (m, K) via the matmul expansion, conditioned by
    centering both operands on the centroid mean: d2 is invariant under a
    common translation, and removing the shared offset is what keeps
    ||z||^2 - 2 z.c + ||c||^2 from cancelling catastrophically in f32
    when the latent mean dwarfs the spread (same failure the dense path
    avoids with ops.student_t.pairwise_sqdist's difference form, which
    at shard scale would materialize (m, K, D))."""
    c0 = jnp.mean(centers, axis=0)
    zc = z - c0
    cc = centers - c0
    return (
        jnp.sum(zc * zc, axis=1, keepdims=True)
        - 2.0 * jax.lax.dot_general(
            zc, cc, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        + jnp.sum(cc * cc, axis=1)[None, :]
    )


def _local_stats(z, centers, mask):
    """Per-shard assignment + sufficient statistics.

    z (m_local, D), centers (K, D), mask (m_local,) -> (labels
    (m_local,), sums (K, D), counts (K,)); masked rows contribute
    nothing.
    """
    labels = jnp.argmin(_sqdist(z, centers), axis=1)
    onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=z.dtype)
    onehot = onehot * mask[:, None]
    sums = onehot.T @ z               # (K, D) — MXU matmul
    counts = jnp.sum(onehot, axis=0)  # (K,)
    return labels, sums, counts


def _pad_for_mesh(z, mesh: Mesh):
    """(z_padded, mask, m): zero-pad the row axis to a mesh multiple and
    return the validity mask (all-ones when already even)."""
    z = jnp.asarray(z)
    m = z.shape[0]
    pad = (-m) % mesh.devices.size
    mask = jnp.ones(m + pad, z.dtype)
    if pad:
        z = jnp.concatenate(
            [z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], axis=0
        )
        mask = mask.at[m:].set(0.0)
    return z, mask, m


def _put(mesh: Mesh, z, mask, *replicated):
    shard = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    return (
        jax.device_put(z, shard),
        jax.device_put(mask, shard),
        *(jax.device_put(jnp.asarray(r), rep) for r in replicated),
    )


@functools.lru_cache(maxsize=8)
def _kmeans_step_fn(mesh: Mesh):
    def step(z_local, mask_local, centers_rep):
        labels, sums, counts = _local_stats(z_local, centers_rep, mask_local)
        sums = jax.lax.psum(sums, DATA_AXIS)
        counts = jax.lax.psum(counts, DATA_AXIS)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
            centers_rep,
        )
        return labels, new

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P()),
    )


def sharded_kmeans_step(z, centers, mesh: Mesh, mask=None):
    """One Lloyd iteration over latents sharded on the data mesh.

    Returns (labels (M,) sharded like z, new_centers (K, D) replicated).
    Empty clusters keep their previous center (sklearn's relocation
    heuristic is a host-side concern; the reference seeds k-means++ so
    empties are rare). `mask` (M,) zeroes rows out of the statistics
    (used for mesh padding); rows must already divide over the mesh.
    """
    z = jnp.asarray(z)
    if mask is None:
        mask = jnp.ones(z.shape[0], z.dtype)
    z, mask, centers = _put(mesh, z, mask, centers)
    return _kmeans_step_fn(mesh)(z, mask, centers)


def sharded_kmeans(
    z,
    n_clusters: int,
    mesh: Mesh,
    *,
    n_iter: int = 100,
    n_init: int = 100,
    init_subsample: int = 65536,
    seed: int = 2009,
    _placed=None,
):
    """Full k-means over latents sharded on the data mesh.

    Centers initialize from the best of `n_init` (reference contract:
    n_init=100, models.py:386-391) single-device k-means++ fits on a
    seeded `init_subsample` (vmapped restarts, cheap, replicated), then
    `n_iter` Lloyd iterations run with psum-reduced sufficient statistics
    (`sharded_kmeans_step`) so the (M, K) working set never leaves its
    shard. Inputs of any length are zero-padded to a mesh multiple with
    the pad rows masked out. Returns (labels (M,), centers replicated).

    Deliberate deviation from the reference: restarts score on the
    subsample, not the full data — at cube scale full-data restarts would
    cost n_init extra passes over HBM for no measured quality difference
    (tests/test_signal.py::test_sharded_kmeans_matches_dense_quality
    asserts NMI parity with the dense full-data path).
    """
    import numpy as np

    from spectrogram_cube_clustering_tpu.cluster.kmeans import kmeans

    if _placed is None:
        zp, mask, m = _pad_for_mesh(z, mesh)
        zp, mask = _put(mesh, zp, mask)[:2]
    else:
        # already padded + placed by the caller (sharded_gmm reuses one
        # transfer of the cube-scale latent matrix for both stages)
        zp, mask, m = _placed
    sub = np.sort(
        np.random.default_rng(seed).choice(
            m, min(init_subsample, m), replace=False
        )
    )
    _, centers = kmeans(
        jnp.asarray(z)[sub], n_clusters, n_init=n_init, max_iter=100,
        seed=seed,
    )
    # device_put once; the cached step function never retraces across
    # iterations (each re-dispatch through a fresh shard_map closure paid
    # a retrace AND a full host->device copy of z per iteration before)
    centers = jax.device_put(
        jnp.asarray(centers), NamedSharding(mesh, P())
    )
    step = _kmeans_step_fn(mesh)
    # Convergence is checked every `check_every` iterations, not every
    # one: each check is a blocking device->host scalar fetch, and on a
    # high-RTT attachment (benchmarks/RESULTS.md host-sync notes) a
    # per-iteration fetch serializes dispatch with execution. Lloyd
    # iterations past convergence are no-ops, so sampled checks only cost
    # a few idempotent steps.
    check_every = 8
    for i in range(n_iter):
        prev = centers
        _, centers = step(zp, mask, centers)
        if (i % check_every == check_every - 1) and bool(
            jnp.allclose(centers, prev, atol=1e-6)
        ):
            break
    # final assignment against the WINNING centers (the loop's labels
    # belong to each iteration's input centers — returning those with the
    # updated centers would be mutually inconsistent, like the dense
    # kmeans' closing assign in cluster/kmeans.py)
    labels, _ = step(zp, mask, centers)
    return labels[:m], centers


@functools.lru_cache(maxsize=8)
def _gmm_em_step_fn(mesh: Mesh, reg_covar: float):
    from spectrogram_cube_clustering_tpu.cluster.gmm import (
        _estimate_log_prob,
    )

    def step(z_local, mask_local, w, mu, cov):
        d = mu.shape[1]
        logp = _estimate_log_prob(z_local, mu, cov) + jnp.log(w)[None, :]
        norm = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
        resp = jnp.exp(logp - norm) * mask_local[:, None]  # (m_local, K)

        m_total = jax.lax.psum(jnp.sum(mask_local), DATA_AXIS)
        nk = jax.lax.psum(jnp.sum(resp, axis=0), DATA_AXIS)
        nk = nk + 10.0 * jnp.finfo(resp.dtype).eps
        first = jax.lax.psum(resp.T @ z_local, DATA_AXIS)         # (K, D)

        def centered_stat(resp_k, mu_k):
            diff = z_local - mu_k                          # (m_local, D)
            return (diff * resp_k[:, None]).T @ diff       # (D, D)

        second_c = jax.lax.psum(
            jax.vmap(centered_stat, in_axes=(1, 0))(resp, mu),  # (K, D, D)
            DATA_AXIS,
        )
        # Same empty-component hazard as _gmm_init_covs_fn: zero
        # responsibility mass would give new_means=0, dmu=-mu, and a
        # covariance of -mu.mu^T — negative definite, NaN-poisoning the
        # next Cholesky and with it EVERY component's responsibilities
        # (and lb goes NaN so the tol check never fires). Freeze empty
        # components at their incoming mean/covariance instead; their
        # returned weight ~0 keeps them inert in later E-steps.
        safe = nk > 1e-3
        nk_div = jnp.where(safe, nk, 1.0)
        new_means = jnp.where(safe[:, None], first / nk_div[:, None], mu)
        dmu = new_means - mu                               # (K, D)
        new_covs = (
            second_c / nk_div[:, None, None]
            - dmu[:, :, None] * dmu[:, None, :]
            + reg_covar * jnp.eye(d, dtype=z_local.dtype)
        )
        new_covs = jnp.where(safe[:, None, None], new_covs, cov)
        lb = (
            jax.lax.psum(jnp.sum(norm[:, 0] * mask_local), DATA_AXIS)
            / m_total
        )
        return nk / m_total, new_means, new_covs, lb

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )


def sharded_gmm_em_step(
    z, weights, means, covs, mesh: Mesh, reg_covar=1e-6, mask=None
):
    """One EM iteration over latents sharded on the data mesh.

    E-step responsibilities are computed per shard; the M-step reduces the
    three sufficient statistics (responsibility mass Nk, first moments,
    CENTERED second moments) with `psum`, matching the dense update of
    cluster.gmm._m_step. Second moments are centered on the incoming
    means: the raw E[zz^T] - mu mu^T form cancels catastrophically in f32
    when the latent mean dwarfs its spread, corrupting covariances into
    non-PSD matrices whose Cholesky is NaN. With c = old mean:
    Cov = E[(z-c)(z-c)^T] - (mu_new-c)(mu_new-c)^T, and (mu_new-c) is one
    EM step's movement — small, so the subtraction is well conditioned.
    Returns (weights, means, covs, mean log-likelihood), all replicated.
    `mask` zeroes rows out of every statistic (mesh padding).
    """
    z = jnp.asarray(z)
    if mask is None:
        mask = jnp.ones(z.shape[0], z.dtype)
    z, mask, weights, means, covs = _put(mesh, z, mask, weights, means, covs)
    return _gmm_em_step_fn(mesh, float(reg_covar))(
        z, mask, weights, means, covs
    )


@functools.lru_cache(maxsize=8)
def _gmm_init_covs_fn(mesh: Mesh, reg_covar: float):
    def step(z_local, mask_local, mu):
        # hard-assignment M-step, the sharded analog of the dense
        # cluster.gmm._init_covariances: covariances measured around each
        # cluster's own mean of its assigned rows (identity init would
        # flatten responsibilities to ~uniform whenever the latent scale
        # is far from 1 and stall EM at a single effective component)
        d = mu.shape[1]
        labels = jnp.argmin(_sqdist(z_local, mu), axis=1)
        resp = jax.nn.one_hot(labels, mu.shape[0], dtype=z_local.dtype)
        resp = resp * mask_local[:, None]
        nk = jax.lax.psum(jnp.sum(resp, axis=0), DATA_AXIS)
        first = jax.lax.psum(resp.T @ z_local, DATA_AXIS)

        def centered_stat(resp_k, mu_k):
            diff = z_local - mu_k
            return (diff * resp_k[:, None]).T @ diff

        second_c = jax.lax.psum(
            jax.vmap(centered_stat, in_axes=(1, 0))(resp, mu), DATA_AXIS
        )
        # EMPTY clusters (possible when K exceeds the populated k-means
        # clusters, e.g. collapsed/duplicate latents): new_means=0 would
        # make dmu=-mu and the covariance -mu.mu^T — strongly negative
        # definite, NaN-poisoning the first Cholesky and thus the whole
        # fit. Keep their mean and give them a unit covariance.
        safe = nk > 0.5
        nk_div = jnp.maximum(nk, 1.0)
        new_means = jnp.where(safe[:, None], first / nk_div[:, None], mu)
        dmu = new_means - mu
        eye = jnp.eye(d, dtype=z_local.dtype)
        covs = (
            second_c / nk_div[:, None, None]
            - dmu[:, :, None] * dmu[:, None, :]
            + reg_covar * eye
        )
        return jnp.where(safe[:, None, None], covs, eye)

    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
    )


@functools.lru_cache(maxsize=8)
def _gmm_assign_fn(mesh: Mesh):
    from spectrogram_cube_clustering_tpu.cluster.gmm import (
        _estimate_log_prob,
    )

    def assign(z_local, w, mu, cov):
        logp = _estimate_log_prob(z_local, mu, cov) + jnp.log(w)[None, :]
        return jnp.argmax(logp, axis=1)

    return jax.shard_map(
        assign,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=P(DATA_AXIS),
    )


def sharded_gmm(
    z,
    n_clusters: int,
    mesh: Mesh,
    *,
    max_iter: int = 100,
    kmeans_n_iter: int = 100,
    tol: float = 1e-3,
    n_init: int = 100,
    seed: int = 2009,
    reg_covar: float = 1e-6,
):
    """Full k-means-initialized GMM over sharded latents (the distributed
    analog of cluster.gmm / reference models.py:365-413).

    Inputs of any length are zero-padded to a mesh multiple internally
    (pad rows masked out of every statistic). Returns (labels (M,), means
    replicated). Convergence follows sklearn semantics: change in mean
    log-likelihood < tol.
    """

    # pad + place the latent matrix ONCE; k-means reuses the same
    # transfer (it used to pad and device_put the full matrix twice)
    zp, mask, m = _pad_for_mesh(z, mesh)
    zp, mask = _put(mesh, zp, mask)[:2]
    km_labels, centers = sharded_kmeans(
        z, n_clusters, mesh, n_iter=kmeans_n_iter, n_init=n_init, seed=seed,
        _placed=(zp, mask, m),
    )
    counts = jnp.bincount(
        jnp.asarray(km_labels).reshape(-1), length=n_clusters
    )
    rep = NamedSharding(mesh, P())
    weights = jax.device_put(
        (counts / counts.sum()).astype(jnp.float32), rep
    )
    means = jax.device_put(jnp.asarray(centers), rep)
    covs = _gmm_init_covs_fn(mesh, float(reg_covar))(zp, mask, means)

    em = _gmm_em_step_fn(mesh, float(reg_covar))
    # sampled convergence checks, same rationale as sharded_kmeans: one
    # blocking scalar fetch per check, and EM is monotone so a few extra
    # iterations past convergence are harmless
    check_every = 4
    prev_lb = -jnp.inf
    for i in range(max_iter):
        weights, means, covs, lb = em(zp, mask, weights, means, covs)
        if i % check_every == check_every - 1:
            # average per-iteration lower-bound change < tol
            if bool(jnp.abs(lb - prev_lb) < tol * check_every):
                break
            prev_lb = lb

    labels = _gmm_assign_fn(mesh)(zp, weights, means, covs)
    return labels[:m], means
