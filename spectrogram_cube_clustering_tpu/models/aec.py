"""Convolutional autoencoder for (4, 101) spectrogram windows.

Architecture parity with Cluster/networks.py:
- Encoder (networks.py:172-189): 3x Conv(k=(2,4), s=(1,2), p=1, 1->8->8->8ch)
  + ReLU, SpatialAttention, flatten (7*12=84), Dense(84->9), ReLU.
- Decoder (networks.py:194-214): Dense(9->84), ReLU, unflatten (7,12,1),
  ConvT(k3, p1, no bias), 3x ConvT(k=(2,4), s=(1,2), p=1) with output_padding
  (0,1)/(0,0)/(0,1), ReLU everywhere including the output.
- AEC (networks.py:217-234): forward(x) -> (x_rec, z).

Layout is NHWC: x is (B, 4, 101, 1); z is (B, 9).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from spectrogram_cube_clustering_tpu.models.layers import (
    SpatialAttention,
    TorchConvTranspose,
    bias_init,
    xavier_init,
)


class Encoder(nn.Module):
    latent_dim: int = 9
    attention_faithful: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda: nn.Conv(  # noqa: E731
            features=8,
            kernel_size=(2, 4),
            strides=(1, 2),
            padding=((1, 1), (1, 1)),
            kernel_init=xavier_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = nn.relu(conv()(x))   # (B, 5, 50, 8)
        x = nn.relu(conv()(x))   # (B, 6, 25, 8)
        x = nn.relu(conv()(x))   # (B, 7, 12, 8)
        x = SpatialAttention(
            faithful=self.attention_faithful,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)                     # (B, 7, 12, 1)
        x = x.reshape((x.shape[0], -1))  # (B, 84); C=1 so HWC order == torch CHW
        z = nn.Dense(
            self.latent_dim,
            kernel_init=xavier_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        return nn.relu(z)


class Decoder(nn.Module):
    latent_dim: int = 9
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.relu(
            nn.Dense(84, kernel_init=xavier_init, bias_init=bias_init, **kw)(z)
        )
        x = x.reshape((x.shape[0], 7, 12, 1))
        x = nn.relu(
            TorchConvTranspose(8, (3, 3), (1, 1), (1, 1), (0, 0), use_bias=False, **kw)(x)
        )  # (B, 7, 12, 8)
        x = nn.relu(
            TorchConvTranspose(8, (2, 4), (1, 2), (1, 1), (0, 1), **kw)(x)
        )  # (B, 6, 25, 8)
        x = nn.relu(
            TorchConvTranspose(8, (2, 4), (1, 2), (1, 1), (0, 0), **kw)(x)
        )  # (B, 5, 50, 8)
        x = nn.relu(
            TorchConvTranspose(1, (2, 4), (1, 2), (1, 1), (0, 1), **kw)(x)
        )  # (B, 4, 101, 1)
        return x


class AEC(nn.Module):
    """Autoencoder; __call__(x) -> (x_rec, z) like networks.py:231-234."""

    latent_dim: int = 9
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
        self.decoder = Decoder(latent_dim=self.latent_dim, **kw)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        x_rec = self.decoder(z)
        return x_rec, z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)
