"""Losses for AEC pretraining and DEC refinement.

Reference semantics:
- AEC: nn.MSELoss(reduction='mean') on (x_rec, x)      (production.py:153)
- DEC: MSE + gamma * KLDivLoss(reduction='sum')(log q, p) / batch
  (Cluster/models.py:1121-1126 with metrics from production.py:162-165).

torch.nn.KLDivLoss(log_q, p) computes sum(xlogy(p, p) - p * log_q); xlogy
gives 0 for p == 0, which matters because the reference's target
distribution is rounded to 5 decimals and contains exact zeros.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import xlogy


def mse(x_rec: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements (torch MSELoss 'mean')."""
    d = x_rec - x
    return jnp.mean(d * d)


def kld_sum(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """KL(p || q) summed over all entries, zero-safe in p (torch KLDivLoss 'sum')."""
    log_q = jnp.log(jnp.maximum(q, eps))
    return jnp.sum(xlogy(p, p) - p * log_q)


def dec_loss(
    x_rec: jnp.ndarray,
    x: jnp.ndarray,
    q: jnp.ndarray,
    p: jnp.ndarray,
    gamma: float,
):
    """DEC total loss and its (reconstruction, clustering) parts.

    loss = MSE(x_rec, x) + gamma * KL(p||q) / batch  (models.py:1121-1126).
    """
    batch = q.shape[0]
    loss_rec = mse(x_rec, x)
    loss_clust = gamma * kld_sum(p, q) / batch
    return loss_rec + loss_clust, (loss_rec, loss_clust)
