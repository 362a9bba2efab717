"""Network definitions (flax.linen), NHWC layout.

Canonical sample: one spectrogram window (4, 101) carried as (B, 4, 101, 1).
The reference uses NCHW (B, 1, 4, 101); `to_nchw` / `from_nchw` convert at
artifact boundaries so saved arrays keep the reference layout.
"""

import jax.numpy as jnp

from spectrogram_cube_clustering_tpu.models.aec import Encoder, Decoder, AEC
from spectrogram_cube_clustering_tpu.models.dec import (
    DEC,
    load_encoder_decoder_from_aec,
    replace_centroids,
)
from spectrogram_cube_clustering_tpu.models.packed import PackedAEC, PackedDEC
from spectrogram_cube_clustering_tpu.models.unet import UNet
from spectrogram_cube_clustering_tpu.models.layers import SpatialAttention, xavier_init, bias_init

INPUT_HEIGHT = 4
INPUT_WIDTH = 101
LATENT_DIM = 9        # Encoder latent (networks.py:184)
UNET_LATENT_DIM = 16  # UNet bottleneck (networks.py:103)


def from_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


__all__ = [
    "Encoder", "Decoder", "AEC", "DEC", "UNet", "PackedAEC", "PackedDEC",
    "SpatialAttention", "load_encoder_decoder_from_aec", "replace_centroids",
    "xavier_init", "bias_init", "from_nchw", "to_nchw",
    "INPUT_HEIGHT", "INPUT_WIDTH", "LATENT_DIM", "UNET_LATENT_DIM",
]
