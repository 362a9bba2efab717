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


def encoder_conv_shapes(input_hw: Tuple[int, int]):
    """Spatial shapes through the encoder's three
    (k=(2,4), s=(1,2), p=1) convs: h -> h + 1, w -> (w - 2) // 2 + 1.
    Returns [(h0, w0), ..., (h3, w3)]. The decoder inverts this chain, so
    the same architecture serves any window geometry — the reference's
    (4, 101) Zarr windows (networks.py:172-214) and the H5 catalog's
    (87, 100) event spectrograms (utils.py:211-287) alike."""
    h, w = int(input_hw[0]), int(input_hw[1])
    shapes = [(h, w)]
    for _ in range(3):
        if w < 2:
            raise ValueError(
                f"window width collapses below the conv kernel: {input_hw}"
            )
        h, w = h + 1, (w - 2) // 2 + 1
        shapes.append((h, w))
    return shapes


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
    input_hw: Tuple[int, int] = (4, 101)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # Invert the encoder's conv chain: the unflatten shape and each
        # transpose-conv output padding are derived from `input_hw`, so
        # the default reproduces the reference geometry exactly
        # (unflatten (7,12), paddings (0,1)/(0,0)/(0,1) —
        # networks.py:194-214) and any other window size round-trips.
        shapes = encoder_conv_shapes(self.input_hw)
        h3, w3 = shapes[3]
        x = nn.relu(
            nn.Dense(
                h3 * w3, kernel_init=xavier_init, bias_init=bias_init, **kw
            )(z)
        )
        x = x.reshape((x.shape[0], h3, w3, 1))
        x = nn.relu(
            TorchConvTranspose(8, (3, 3), (1, 1), (1, 1), (0, 0), use_bias=False, **kw)(x)
        )  # (B, h3, w3, 8)
        h, w = h3, w3
        for i, (ht, wt) in enumerate((shapes[2], shapes[1], shapes[0])):
            # ConvT out = (in-1)*s - 2p + k + op; solve op for the target
            op = (ht - h + 1, wt - 2 * w)
            feats = 1 if i == 2 else 8
            x = nn.relu(
                TorchConvTranspose(feats, (2, 4), (1, 2), (1, 1), op, **kw)(x)
            )
            h, w = ht, wt
        return x


class AEC(nn.Module):
    """Autoencoder; __call__(x) -> (x_rec, z) like networks.py:231-234.

    `input_hw` sets the window geometry: (4, 101) Zarr windows by default,
    (87, 100) for the H5 event-catalog source (SURVEY.md C3)."""

    latent_dim: int = 9
    input_hw: Tuple[int, int] = (4, 101)
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

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        x_rec = self.decoder(z)
        return x_rec, z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)
