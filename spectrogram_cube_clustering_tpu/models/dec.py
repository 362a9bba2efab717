"""Deep Embedded Clustering model.

Reference: Cluster/networks.py:251-323. The ClusteringLayer is a trainable
(K, D) centroid matrix plus the pure Student-t assignment
(ops.student_t.student_t_assignment); forward(x) -> (q, x_rec, z) matching
DEC.forward (networks.py:319-323).

Centroids initialize Xavier-uniform like the reference
(networks.py:270-274) and are overwritten with GMM/k-means centroids before
refinement via `replace_centroids` (reference: models.py:1006-1008).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from spectrogram_cube_clustering_tpu.models.aec import Decoder, Encoder
from spectrogram_cube_clustering_tpu.models.layers import xavier_init
from spectrogram_cube_clustering_tpu.ops.student_t import student_t_assignment


class DEC(nn.Module):
    n_clusters: int
    latent_dim: int = 9
    input_hw: tuple = (4, 101)
    alpha: float = 1.0
    attention_faithful: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(
            latent_dim=self.latent_dim,
            attention_faithful=self.attention_faithful,
            **kw,
        )
        self.decoder = Decoder(
            latent_dim=self.latent_dim, input_hw=self.input_hw, **kw
        )
        self.centroids = self.param(
            "centroids", xavier_init, (self.n_clusters, self.latent_dim),
            self.param_dtype,
        )

    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        x_rec = self.decoder(z)
        q = student_t_assignment(z, self.centroids, self.alpha)
        return q, x_rec, z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)


def replace_centroids(params, centroids: jnp.ndarray):
    """Return params with the clustering centroids overwritten (pure update).

    Reference: models.py:1006-1008 copies GMM centroids into
    clustering.weights in-place; here params are immutable pytrees.
    """
    new = dict(params)
    new["centroids"] = jnp.asarray(centroids, dtype=params["centroids"].dtype)
    return type(params)(new) if not isinstance(params, dict) else new


def load_encoder_decoder_from_aec(dec_params, aec_params):
    """Transfer encoder/decoder params from a trained AEC into DEC params.

    Reference analog: load_state_dict(..., strict=False) (models.py:977-979).
    Unlike the reference — where AEC-mode actually trains a UNet so nothing
    transfers (SURVEY.md §2.3 defect 2) — this is an explicit, total copy of
    both submodules; the centroids entry is left untouched.
    """
    new = dict(dec_params)
    new["encoder"] = aec_params["encoder"]
    new["decoder"] = aec_params["decoder"]
    # preserve the container type (FrozenDict stays FrozenDict), same as
    # replace_centroids — a mixed mutable/frozen tree breaks container-
    # sensitive consumers only for this one entry point
    return type(dec_params)(new) if not isinstance(dec_params, dict) else new
