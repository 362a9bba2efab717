"""UNet autoencoder (the model AEC-mode training actually instantiates in the
reference, production.py:150).

Architecture parity with Cluster/networks.py:91-153:
- down path: double-conv blocks (k=(2,4), p=1) 1->16->32->64->128 with 2x2
  maxpools between, to (4, 8, 128);
- bottleneck: 4 sigmoid-gated Dense layers 4096->1024->256->64->16 (latent 16,
  networks.py:103) and the mirror 16->...->4096 (networks.py:70-88);
- up path: double-conv2 blocks (k=3, p=1) over skip concatenations
  [down, up], ConvT(k=(2,6), s=2, p=(2,0)) upsamples, output conv
  Conv(16->1, k=3, p=(0,2)).
(The reference's unused down_convolution_5 / up_transpose_4 are omitted.)

Contract: __call__(x) -> (x_rec, z). The reference returns (out, x) — the
input, not the latent (networks.py:153) — which is why its DEC stage can
never inherit UNet encoder weights (SURVEY.md §2.3 defect 2). Returning the
16-d latent makes the UNet a drop-in for the AEC training contract and lets
GMM/DEC consume its latent space.

Flatten/unflatten go through NCHW ordering so torch weights port exactly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from spectrogram_cube_clustering_tpu.models.layers import (
    TorchConvTranspose,
    bias_init,
    xavier_init,
)


class DoubleConv(nn.Module):
    """Two Conv+ReLU with torch-style padding=1 (networks.py:14-42)."""

    features: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                padding=((1, 1), (1, 1)),
                kernel_init=xavier_init,
                bias_init=bias_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
        return x


def _max_pool_2x2(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class UNet(nn.Module):
    latent_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dense = lambda n: nn.Dense(  # noqa: E731
            n, kernel_init=xavier_init, bias_init=bias_init, **kw
        )

        down_1 = DoubleConv(16, (2, 4), **kw)(x)        # (B, 6, 99, 16)
        down_3 = DoubleConv(32, (2, 4), **kw)(_max_pool_2x2(down_1))  # (B, 5, 47, 32)
        down_5 = DoubleConv(64, (2, 4), **kw)(_max_pool_2x2(down_3))  # (B, 4, 21, 64)
        down_7 = DoubleConv(128, (2, 4), **kw)(_max_pool_2x2(down_5))  # (B, 4, 8, 128)

        # Bottleneck (torch CHW flatten order for exact weight porting).
        # The reference hardwires the final width to n_in//256 == 16
        # (networks.py:45-67); latent_dim keeps that default but is LIVE —
        # it sets the innermost layer of both chains (a silently ignored
        # constructor arg would run a 16-d experiment configured for 32).
        b, h, w, c = down_7.shape
        flat = jnp.transpose(down_7, (0, 3, 1, 2)).reshape((b, -1))  # (B, 4096)
        n_in = c * h * w
        z = flat
        for n in (n_in // 4, n_in // 16, n_in // 64, self.latent_dim):
            z = nn.sigmoid(dense(n)(z))                 # -> (B, latent_dim)

        u = z
        for n in (self.latent_dim, n_in // 64, n_in // 16, n_in // 4, n_in):
            u = nn.sigmoid(dense(n)(u))
        up_0 = jnp.transpose(u.reshape((b, c, h, w)), (0, 2, 3, 1))  # (B, 4, 8, 128)

        y = DoubleConv(128, (3, 3), **kw)(
            jnp.concatenate([down_7, up_0], axis=-1)
        )
        up_1 = TorchConvTranspose(64, (2, 6), (2, 2), (2, 0), (0, 1), **kw)(y)  # (B, 4, 21, 64)
        y = DoubleConv(64, (3, 3), **kw)(jnp.concatenate([down_5, up_1], axis=-1))
        up_2 = TorchConvTranspose(32, (2, 6), (2, 2), (2, 0), (1, 1), **kw)(y)  # (B, 5, 47, 32)
        y = DoubleConv(32, (3, 3), **kw)(jnp.concatenate([down_3, up_2], axis=-1))
        up_3 = TorchConvTranspose(16, (2, 6), (2, 2), (2, 0), (0, 1), **kw)(y)  # (B, 6, 99, 16)
        y = DoubleConv(16, (3, 3), **kw)(jnp.concatenate([down_1, up_3], axis=-1))
        out = nn.Conv(
            1,
            kernel_size=(3, 3),
            padding=((0, 0), (2, 2)),
            kernel_init=xavier_init,
            bias_init=bias_init,
            **kw,
        )(y)                                            # (B, 4, 101, 1)
        return out, z
