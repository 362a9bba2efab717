"""Student-t soft assignment and DEC target distribution.

Reference semantics:
- soft assignment q_ij = (1 + ||z_i - mu_j||^2 / alpha)^-((alpha+1)/2),
  row-normalized (Cluster/networks.py:279-288, ClusteringLayer.forward).
- target distribution p = q^2 / colsum(q), row-renormalized, rounded to 5
  decimals (Cluster/models.py:1302-1322). The rounding is part of the
  reference's numerics contract (batch_eval also rounds q to 5 dp,
  models.py:94) and is kept behind `round_decimals`.

These are pure functions; the DEC model keeps centroids as a flax param and
calls `student_t_assignment`, instead of hiding the math in a stateful layer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def pairwise_sqdist(z: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances (M, K) between rows of z (M, D) and mu (K, D).

    Computed by explicit differences (VPU) rather than the matmul expansion:
    at D=9 / K<=32 the MXU wins nothing and the difference form avoids the
    catastrophic cancellation of ||z||^2 - 2 z.mu + ||mu||^2 in f32.
    """
    diff = z[:, None, :] - mu[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def student_t_assignment(
    z: jnp.ndarray, mu: jnp.ndarray, alpha: float = 1.0
) -> jnp.ndarray:
    """Soft cluster assignments q (M, K) for latents z (M, D), centroids mu (K, D)."""
    d2 = pairwise_sqdist(z, mu)
    w = (1.0 + d2 / alpha) ** (-(alpha + 1.0) / 2.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def target_distribution(
    q: jnp.ndarray, round_decimals: Optional[int] = 5
) -> jnp.ndarray:
    """Auxiliary target distribution p from soft assignments q (M, K).

    p_ij = q_ij^2 / sum_i q_ij, then rows renormalized; optionally rounded to
    `round_decimals` (reference rounds to 5, models.py:1322; pass None for the
    unrounded distribution).
    """
    tiny = jnp.finfo(q.dtype).tiny
    # colsum > 0 always holds for Student-t q (strictly positive); the guard
    # only protects the degenerate all-zero-column case from 0/0 NaNs.
    weight = q * q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), tiny)
    p = weight / jnp.maximum(jnp.sum(weight, axis=-1, keepdims=True), tiny)
    if round_decimals is not None:
        p = jnp.round(p, round_decimals)
    return p
