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
    mask: jnp.ndarray = None,
):
    """DEC total loss and its (reconstruction, clustering) parts.

    loss = MSE(x_rec, x) + gamma * KL(p||q) / batch  (models.py:1121-1126).

    `mask` (float, 1.0 = valid row) drops padded rows out of BOTH terms
    and normalizes by the valid count — the exact loss `train_dec`
    optimizes on a ragged final batch (this is the single loss body the
    training steps call; keep it that way so the exported API can never
    drift from what training optimized). With mask=None every row is
    valid, which reduces to the reference's full-batch formula above.
    """
    if mask is None:
        mask = jnp.ones(q.shape[0], x.dtype)
    d = x_rec - x
    per = jnp.mean(d * d, axis=tuple(range(1, x.ndim)))
    nvalid = jnp.maximum(jnp.sum(mask), 1.0)
    loss_rec = jnp.sum(per * mask) / nvalid
    log_q = jnp.log(jnp.maximum(q, jnp.finfo(q.dtype).tiny))
    row_kld = jnp.sum(xlogy(p, p) - p * log_q, axis=-1)
    loss_clust = gamma * jnp.sum(row_kld * mask) / nvalid
    return loss_rec + loss_clust, (loss_rec, loss_clust)
