"""MXU-packed autoencoder family (`arch = packed`).

The reference-parity AEC (models/aec.py, networks.py:172-234) contracts
over 1*2*4=8 (first conv) and 8*2*4=64 (later convs) elements — a
fraction of the 128-wide MXU systolic array, which caps the step at ~25%
MFU. This variant space-to-depths the (4, 101) window by (2, 2) into a
(2, 52, 4) grid and runs 32-channel convs, so every contraction spans
32/256 elements. Measured on one v5e (benchmarks/contraction_width_tpu.py,
benchmarks/RESULTS.md round 3): 5.15 M train samples/s vs 3.62 M for the
parity AEC — 1.42x at equal-or-better reconstruction loss, despite ~4x
the per-sample FLOPs.

Same task contract as AEC/DEC — __call__(x (B, 4, 101, 1)) returns
(x_rec, z) / (q, x_rec, z) with a 9-dim latent — but a different latent
space: weights and latents do NOT interchange with the reference's
artifacts, which is why the parity AEC stays the default architecture.

Trade-off note: 64 channels measured SLOWER (0.72x) — past ~32 channels
the extra FLOPs stop being free and the step turns compute-bound.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from spectrogram_cube_clustering_tpu.models.layers import (
    bias_init,
    xavier_init,
)
from spectrogram_cube_clustering_tpu.ops.student_t import student_t_assignment

_H, _W = 4, 101  # reference window geometry (ZarrDataLoader.py:49-57)
_WPAD = 104      # W padded to a multiple of the (2, 2) packing


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, 101, 1) -> (B, 2, 52, 4) via (2, 2) block packing."""
    b = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, _WPAD - _W), (0, 0)))
    x = x.reshape(b, 2, 2, _WPAD // 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2, _WPAD // 2, 4)


def _depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 52, 4) -> (B, 4, 101, 1), inverse of _space_to_depth."""
    b = x.shape[0]
    x = x.reshape(b, 2, _WPAD // 2, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, _H, _WPAD, 1)[:, :, :_W, :]


class PackedEncoder(nn.Module):
    latent_dim: int = 9
    features: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(
            kernel_init=xavier_init, bias_init=bias_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x = _space_to_depth(x)
        for _ in range(3):
            x = nn.relu(
                nn.Conv(self.features, (2, 4), (1, 2),
                        padding=((1, 1), (1, 1)), **kw)(x)
            )
        z = nn.Dense(self.latent_dim, **kw)(x.reshape(x.shape[0], -1))
        return nn.relu(z)


class PackedDecoder(nn.Module):
    latent_dim: int = 9
    features: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        kw = dict(
            kernel_init=xavier_init, bias_init=bias_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        b = z.shape[0]
        # unflatten to (2, 7, F): three stride-(1, 2) transpose convs
        # reach W 7 -> 14 -> 28 -> 56 >= 52, cropped to the packed grid
        d = nn.relu(nn.Dense(2 * 7 * self.features, **kw)(z))
        d = d.reshape(b, 2, 7, self.features)
        d = nn.relu(
            nn.ConvTranspose(self.features, (2, 4), (1, 2),
                             padding="SAME", **kw)(d)
        )
        d = nn.relu(
            nn.ConvTranspose(self.features, (2, 4), (1, 2),
                             padding="SAME", **kw)(d)
        )
        d = nn.relu(
            nn.ConvTranspose(4, (2, 4), (1, 2), padding="SAME", **kw)(d)
        )
        d = d[:, :2, : _WPAD // 2, :4]
        return _depth_to_space(d)


class PackedAEC(nn.Module):
    """MXU-packed autoencoder; __call__(x) -> (x_rec, z)."""

    latent_dim: int = 9
    features: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = PackedEncoder(
            latent_dim=self.latent_dim, features=self.features, **kw
        )
        self.decoder = PackedDecoder(
            latent_dim=self.latent_dim, features=self.features, **kw
        )

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        return self.decoder(z), z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)


class PackedDEC(nn.Module):
    """MXU-packed DEC; __call__(x) -> (q, x_rec, z). Same training/
    clustering contract as models.DEC (centroids param, replace_centroids
    works unchanged)."""

    n_clusters: int
    latent_dim: int = 9
    features: int = 32
    alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = PackedEncoder(
            latent_dim=self.latent_dim, features=self.features, **kw
        )
        self.decoder = PackedDecoder(
            latent_dim=self.latent_dim, features=self.features, **kw
        )
        self.centroids = self.param(
            "centroids", xavier_init, (self.n_clusters, self.latent_dim),
            self.param_dtype,
        )

    def __call__(self, x: jnp.ndarray):
        z = self.encoder(x)
        x_rec = self.decoder(z)
        q = student_t_assignment(z, self.centroids, self.alpha)
        return q, x_rec, z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)
