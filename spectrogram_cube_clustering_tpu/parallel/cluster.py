"""Distributed clustering primitives: psum-reduced sufficient statistics.

The reference's k-means/GMM run single-device via sklearn/cuML
(Cluster/models.py:365-413). At cube scale the latent matrix is sharded
across the data mesh; one Lloyd / EM step then needs only two global
reductions — per-cluster sums and counts — expressed as `psum` inside
`shard_map` (SURVEY.md §5 "Distributed communication backend": the same
pattern carries GMM-EM responsibilities).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS


def _local_stats(z, centers):
    """Per-shard assignment + sufficient statistics.

    z (m_local, D), centers (K, D) -> (labels (m_local,), sums (K, D),
    counts (K,)).
    """
    d2 = (
        jnp.sum(z * z, axis=1, keepdims=True)
        - 2.0 * z @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    labels = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=z.dtype)
    sums = onehot.T @ z               # (K, D) — MXU matmul
    counts = jnp.sum(onehot, axis=0)  # (K,)
    return labels, sums, counts


def sharded_kmeans(
    z,
    n_clusters: int,
    mesh: Mesh,
    *,
    n_iter: int = 100,
    n_init: int = 100,
    init_subsample: int = 65536,
    seed: int = 2009,
):
    """Full k-means over latents sharded on the data mesh.

    Centers initialize from the best of `n_init` (reference contract:
    n_init=100, models.py:386-391) single-device k-means++ fits on a
    seeded `init_subsample` (vmapped restarts, cheap, replicated), then
    `n_iter` Lloyd iterations run with psum-reduced sufficient statistics
    (`sharded_kmeans_step`) so the (M, K) working set never leaves its
    shard. Returns (labels sharded like z, centers replicated).

    Deliberate deviation from the reference: restarts score on the
    subsample, not the full data — at cube scale full-data restarts would
    cost n_init extra passes over HBM for no measured quality difference
    (tests/test_signal.py::test_sharded_kmeans_matches_dense_quality
    asserts NMI parity with the dense full-data path).
    """
    import numpy as np

    from spectrogram_cube_clustering_tpu.cluster.kmeans import kmeans

    m = z.shape[0]
    if m % mesh.devices.size != 0:
        raise ValueError(
            f"{m} samples do not shard evenly over the "
            f"{mesh.devices.size}-device mesh; pad or trim first"
        )
    sub = np.sort(
        np.random.default_rng(seed).choice(
            m, min(init_subsample, m), replace=False
        )
    )
    _, centers = kmeans(
        jnp.asarray(z)[sub], n_clusters, n_init=n_init, max_iter=100,
        seed=seed,
    )
    # Convergence is checked every `check_every` iterations, not every
    # one: each check is a blocking device->host scalar fetch, and on a
    # high-RTT attachment (benchmarks/RESULTS.md host-sync notes) a
    # per-iteration fetch serializes dispatch with execution. Lloyd
    # iterations past convergence are no-ops, so sampled checks only cost
    # a few idempotent steps.
    check_every = 8
    for i in range(n_iter):
        prev = centers
        _, centers = sharded_kmeans_step(z, centers, mesh)
        if (i % check_every == check_every - 1) and bool(
            jnp.allclose(centers, prev, atol=1e-6)
        ):
            break
    # final assignment against the WINNING centers (the loop's labels
    # belong to each iteration's input centers — returning those with the
    # updated centers would be mutually inconsistent, like the dense
    # kmeans' closing assign in cluster/kmeans.py)
    labels, _ = sharded_kmeans_step(z, centers, mesh)
    return labels, centers


def sharded_gmm(
    z,
    n_clusters: int,
    mesh: Mesh,
    *,
    max_iter: int = 100,
    tol: float = 1e-3,
    n_init: int = 100,
    seed: int = 2009,
    reg_covar: float = 1e-6,
):
    """Full k-means-initialized GMM over sharded latents (the distributed
    analog of cluster.gmm / reference models.py:365-413).

    Returns (labels sharded like z, means replicated). Convergence follows
    sklearn semantics: change in mean log-likelihood < tol.
    """
    import numpy as np

    km_labels, centers = sharded_kmeans(
        z, n_clusters, mesh, n_init=n_init, seed=seed
    )
    counts = jnp.bincount(
        jnp.asarray(km_labels).reshape(-1), length=n_clusters
    )
    weights = (counts / counts.sum()).astype(jnp.float32)
    means = jnp.asarray(centers)
    d = means.shape[1]
    covs = jnp.stack([jnp.eye(d, dtype=jnp.float32)] * n_clusters)

    # sampled convergence checks, same rationale as sharded_kmeans: one
    # blocking scalar fetch per check, and EM is monotone so a few extra
    # iterations past convergence are harmless
    check_every = 4
    prev_lb = -jnp.inf
    for i in range(max_iter):
        weights, means, covs, lb = sharded_gmm_em_step(
            z, weights, means, covs, mesh, reg_covar
        )
        if i % check_every == check_every - 1:
            # average per-iteration lower-bound change < tol
            if bool(jnp.abs(lb - prev_lb) < tol * check_every):
                break
            prev_lb = lb

    # final responsibilities -> labels, per shard
    from spectrogram_cube_clustering_tpu.cluster.gmm import (
        _estimate_log_prob,
    )

    def assign(z_local, w, mu, cov):
        logp = _estimate_log_prob(z_local, mu, cov) + jnp.log(w)[None, :]
        return jnp.argmax(logp, axis=1)

    mapped = jax.shard_map(
        assign,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=P(DATA_AXIS),
    )
    z_sharded = jax.device_put(
        jnp.asarray(z), NamedSharding(mesh, P(DATA_AXIS))
    )
    labels = mapped(z_sharded, weights, means, covs)
    return labels, means


def sharded_gmm_em_step(z, weights, means, covs, mesh: Mesh, reg_covar=1e-6):
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
    """
    from spectrogram_cube_clustering_tpu.cluster.gmm import (
        _estimate_log_prob,
    )

    k, d = means.shape

    def step(z_local, w, mu, cov):
        logp = _estimate_log_prob(z_local, mu, cov) + jnp.log(w)[None, :]
        norm = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
        resp = jnp.exp(logp - norm)                       # (m_local, K)

        m_total = jax.lax.psum(z_local.shape[0], DATA_AXIS)
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
        new_means = first / nk[:, None]
        dmu = new_means - mu                               # (K, D)
        new_covs = (
            second_c / nk[:, None, None]
            - dmu[:, :, None] * dmu[:, None, :]
            + reg_covar * jnp.eye(d, dtype=z_local.dtype)
        )
        lb = jax.lax.psum(jnp.sum(norm), DATA_AXIS) / m_total
        return nk / m_total, new_means, new_covs, lb

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    z = jax.device_put(z, NamedSharding(mesh, P(DATA_AXIS)))
    return mapped(
        jnp.asarray(z), jnp.asarray(weights), jnp.asarray(means),
        jnp.asarray(covs),
    )


def sharded_kmeans_step(z, centers, mesh: Mesh):
    """One Lloyd iteration over latents sharded on the data mesh.

    Returns (labels (M,) sharded like z, new_centers (K, D) replicated).
    Empty clusters keep their previous center (sklearn's relocation
    heuristic is a host-side concern; the reference seeds k-means++ so
    empties are rare).
    """

    def step(z_local, centers_rep):
        labels, sums, counts = _local_stats(z_local, centers_rep)
        sums = jax.lax.psum(sums, DATA_AXIS)
        counts = jax.lax.psum(counts, DATA_AXIS)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
            centers_rep,
        )
        return labels, new

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P()),
    )
    z = jax.device_put(z, NamedSharding(mesh, P(DATA_AXIS)))
    centers = jax.device_put(centers, NamedSharding(mesh, P()))
    return mapped(z, centers)
