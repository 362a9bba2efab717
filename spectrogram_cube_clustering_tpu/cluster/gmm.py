"""Full-covariance Gaussian mixture EM, on-device.

Reference contract (Cluster/models.py:365-413 `gmm`): k-means (n_init=100,
seed 2009) provides labels; cluster shares become weights_init and centroids
means_init for sklearn GaussianMixture(n_components, max_iter=1000, n_init=1)
EM; returns (labels, means).

This implementation follows sklearn's full-covariance EM semantics
(reg_covar=1e-6 on the diagonal, convergence when the change in mean
log-likelihood < tol=1e-3) with all per-iteration work expressed as
matmuls/Cholesky factorizations under one jit: the E-step responsibilities
and M-step sufficient statistics are (M,K)/(K,D)/(K,D,D) contractions that
map straight onto the MXU, and in the sharded path the sufficient statistics
are psum-reduced across the data mesh (SURVEY.md §5 "communication backend").

Covariance init: hard-assign samples to the provided means and take
per-cluster covariances (+reg). (sklearn seeds covariances from an internal
k-means' responsibilities; on separated data both give NMI-identical fits —
tested in tests/test_cluster.py.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_LOG_2PI = 1.8378770664093453


class GMMState(NamedTuple):
    weights: jnp.ndarray      # (K,)
    means: jnp.ndarray        # (K, D)
    covariances: jnp.ndarray  # (K, D, D)
    lower_bound: jnp.ndarray  # scalar mean log-likelihood
    n_iter: jnp.ndarray       # scalar int
    converged: jnp.ndarray    # scalar bool


def _estimate_log_prob(z, means, covs):
    """(M, K) log N(z | mu_k, Sigma_k) via per-component Cholesky."""

    def comp(mu, cov):
        chol = jnp.linalg.cholesky(cov)
        diff = (z - mu).T                                   # (D, M)
        y = jax.scipy.linalg.solve_triangular(chol, diff, lower=True)
        maha = jnp.sum(y * y, axis=0)                       # (M,)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (z.shape[1] * _LOG_2PI + logdet + maha)

    return jax.vmap(comp)(means, covs).T                    # (M, K)


def _e_step(z, weights, means, covs):
    logp = _estimate_log_prob(z, means, covs) + jnp.log(weights)[None, :]
    norm = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
    return jnp.mean(norm), logp - norm                      # lb, log_resp


def _m_step(z, log_resp, reg_covar):
    m, d = z.shape
    resp = jnp.exp(log_resp)                                # (M, K)
    nk = jnp.sum(resp, axis=0) + 10.0 * jnp.finfo(resp.dtype).eps
    means = (resp.T @ z) / nk[:, None]                      # (K, D)

    def cov_k(resp_k, nk_k, mu):
        diff = z - mu                                       # (M, D)
        c = (diff * resp_k[:, None]).T @ diff               # (D, D)
        # divide by the same eps-guarded nk as the means: a component with
        # zero responsibility (possible when K exceeds the natural cluster
        # count) would otherwise produce 0/0 = NaN covariances that poison
        # the Cholesky and silently corrupt the whole fit
        return c / nk_k + reg_covar * jnp.eye(d, dtype=z.dtype)

    covs = jax.vmap(cov_k, in_axes=(1, 0, 0))(resp, nk, means)
    return nk / m, means, covs


def _init_covariances(z, means, reg_covar):
    """Per-cluster covariance from hard assignment to the initial means."""
    from spectrogram_cube_clustering_tpu.ops.student_t import pairwise_sqdist

    d2 = pairwise_sqdist(z, means)
    onehot = jax.nn.one_hot(jnp.argmin(d2, axis=-1), means.shape[0], dtype=z.dtype)
    log_resp = jnp.log(jnp.maximum(onehot, jnp.finfo(z.dtype).tiny))
    _, _, covs = _m_step(z, log_resp, reg_covar)
    return covs


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _gmm_fit_jit(z, weights0, means0, max_iter, tol, reg_covar):
    covs0 = _init_covariances(z, means0, reg_covar)

    def cond(state):
        _, _, _, _, prev_lb, lb, it = state
        return jnp.logical_and(it < max_iter, jnp.abs(lb - prev_lb) >= tol)

    def body(state):
        # the carried log_resp is the E-step of the current params, so
        # each iteration pays exactly one E-step (M then E) — the lb of
        # the new params doubles as the next iteration's responsibilities
        _, _, _, log_resp, _, lb, it = state
        weights, means, covs = _m_step(z, log_resp, reg_covar)
        new_lb, new_log_resp = _e_step(z, weights, means, covs)
        return weights, means, covs, new_log_resp, lb, new_lb, it + 1

    lb0, log_resp0 = _e_step(z, weights0, means0, covs0)
    w, mu, cov = _m_step(z, log_resp0, reg_covar)
    lb1, log_resp1 = _e_step(z, w, mu, cov)
    state = (w, mu, cov, log_resp1, lb0, lb1, jnp.array(1))
    weights, means, covs, log_resp, prev_lb, lb, n_iter = lax.while_loop(
        cond, body, state
    )

    labels = jnp.argmax(log_resp, axis=1)
    converged = jnp.abs(lb - prev_lb) < tol
    return labels, GMMState(weights, means, covs, lb, n_iter, converged)


def gmm_em(
    z_array,
    weights_init,
    means_init,
    *,
    max_iter: int = 1000,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
):
    """EM from explicit initial weights/means. Returns (labels, GMMState)."""
    z = jnp.asarray(z_array)
    if z.dtype not in (jnp.float32, jnp.float64):
        z = z.astype(jnp.float32)
    return _gmm_fit_jit(
        z,
        jnp.asarray(weights_init, z.dtype),
        jnp.asarray(means_init, z.dtype),
        max_iter,
        tol,
        reg_covar,
    )


def gmm(
    z_array,
    n_clusters: int,
    *,
    n_init: int = 100,
    kmeans_max_iter: int = 1000,
    max_iter: int = 1000,
    seed: int = 2009,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-means-initialized GMM: the reference's `gmm` (models.py:365-413).

    Returns (labels (M,), centroids (K, D)) where centroids are the fitted
    Gaussian means.
    """
    from spectrogram_cube_clustering_tpu.cluster.kmeans import kmeans

    km_labels, km_centers = kmeans(
        z_array, n_clusters, n_init=n_init, max_iter=kmeans_max_iter, seed=seed
    )
    counts = jnp.bincount(km_labels, length=n_clusters)
    weights = counts / km_labels.shape[0]
    labels, state = gmm_em(z_array, weights, km_centers, max_iter=max_iter)
    return labels, state.means


def gmm_predict(z_array, state: GMMState) -> jnp.ndarray:
    """Hard assignments of new samples under a fitted mixture."""
    z = jnp.asarray(z_array, state.means.dtype)
    _, log_resp = _e_step(z, state.weights, state.means, state.covariances)
    return jnp.argmax(log_resp, axis=1)
