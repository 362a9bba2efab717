"""Per-sample spectrogram normalizers.

Reference semantics (Cluster/ZarrDataLoader.py:14-30 and the numpy duplicates
at Cluster/utils.py:213-231). Each sample is one spectrogram window; all
statistics are taken over the window's two trailing (freq, time-bin) axes so
the functions broadcast over arbitrary leading batch/window dims — in the
reference these run per-sample in DataLoader worker processes, here they fuse
into the device compute under jit.

- sample_normalization : X / max|X|                 (ZarrDataLoader.py:20-21)
- sample_norm_cent     : (X - mean) / (max|X|+1e-8) (ZarrDataLoader.py:22-23;
                         the default everywhere, AEC_train.py:39)
- vec_norm             : X / (||X||_2 + 1e-8)       (ZarrDataLoader.py:24-29)

Accepted layouts: (..., H, W) or NHWC (..., H, W, 1) — a trailing
singleton channel axis is treated as part of the window, so stats always
span the full (H, W) spectrogram.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp


def _window_axes(x: jnp.ndarray) -> Tuple[int, int]:
    """The (freq-row, time-bin) axes of one window: the last two axes, or
    the two before a trailing singleton channel axis (NHWC)."""
    if x.ndim >= 3 and x.shape[-1] == 1:
        return (-3, -2)
    return (-2, -1)


def sample_normalization(x: jnp.ndarray) -> jnp.ndarray:
    """Divide by the per-window max absolute value."""
    axes = _window_axes(x)
    denom = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    return x / denom


def sample_norm_cent(x: jnp.ndarray) -> jnp.ndarray:
    """Subtract the per-window mean, divide by per-window absmax + 1e-8."""
    axes = _window_axes(x)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    denom = jnp.max(jnp.abs(x), axis=axes, keepdims=True) + 1e-8
    return (x - mean) / denom


def vec_norm(x: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize each flattened window."""
    axes = _window_axes(x)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True)) + 1e-8
    return x / norm


_REGISTRY = {
    "sample_normalization": sample_normalization,
    "sample_norm_cent": sample_norm_cent,
    "vec_norm": vec_norm,
}


def make_normalizer(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Name -> normalizer fn; None means identity.

    Deliberate deviation from the reference: its if/elif dispatch silently
    passes UNKNOWN names through un-normalized (ZarrDataLoader.py:18-30) —
    a typo'd `transform` would train on raw data without a trace. Here an
    unknown name raises instead."""
    if name is None:
        return lambda x: x
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown transform {name!r}; expected one of {sorted(_REGISTRY)}"
        ) from None
