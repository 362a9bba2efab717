"""Shared layers and initializers.

Initialization contract (reference `init_weights`, Cluster/networks.py:237-248):
Xavier-uniform weights, constant 0.01 biases, for every Linear / Conv /
ConvTranspose. (The reference only `.apply()`s this to the UNet,
production.py:151, leaving Encoder/Decoder on torch defaults — an
inconsistency; the rebuild applies one documented policy everywhere.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

xavier_init = nn.initializers.xavier_uniform()
bias_init = nn.initializers.constant(0.01)


def torch_convt_padding(
    kernel: Sequence[int], padding: Sequence[int], output_padding: Sequence[int]
) -> Tuple[Tuple[int, int], ...]:
    """lax.conv_transpose padding pairs reproducing torch ConvTranspose2d.

    torch out = (i-1)*s - 2p + k + op  <=>  lax pad (k-1-p, k-1-p+op) per dim
    (verified exactly against torch in tests/test_torch_parity.py). Negative
    pads (k <= p) crop, matching torch.
    """
    return tuple(
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip(kernel, padding, output_padding)
    )


class TorchConvTranspose(nn.Module):
    """ConvTranspose with torch geometry (stride/padding/output_padding).

    Uses transpose_kernel=True so a ported torch weight (in, out, kh, kw)
    maps to our kernel via transpose(2, 3, 1, 0) with exact outputs.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = torch_convt_padding(self.kernel_size, self.padding, self.output_padding)
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            transpose_kernel=True,
            use_bias=self.use_bias,
            kernel_init=xavier_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class SpatialAttention(nn.Module):
    """2-D spatial attention over channel statistics.

    Reference: Cluster/networks.py:157-168. NOTE the reference's forward
    returns ``conv_out * sigmoid(conv_out)`` — it gates the attention map by
    itself and DISCARDS the input feature map (networks.py:163-168).
    `faithful=True` (default) replicates that behavior for output parity;
    `faithful=False` applies the conventional ``x * sigmoid(conv_out)``.
    """

    faithful: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = jnp.concatenate([avg, mx], axis=-1)
        a = nn.Conv(
            features=1,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=xavier_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(a)
        if self.faithful:
            return a * nn.sigmoid(a)
        return x * nn.sigmoid(a)
