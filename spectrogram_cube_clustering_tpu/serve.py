"""Serving: low-latency online inference over trained models.

The reference has no serving story — inference is the batch `predict`
workflow writing `.npy` artifacts (production.py:65-106). For production
deployment this module wraps trained params in a fixed-shape jitted
predictor: requests of any size pad to the compiled batch (no recompiles,
stable tail latency), and all three outputs (soft assignments, labels,
latents) come from one device pass.

    predictor = serve.DECPredictor.from_checkpoint(path, n_clusters=5)
    out = predictor(windows)            # dict with q, labels, z
    z = serve.AECEncoder.from_checkpoint(path)(windows)
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_cube_clustering_tpu import models as _models
from spectrogram_cube_clustering_tpu.ops.normalize import make_normalizer


def _pad_to(x: np.ndarray, batch: int) -> tuple:
    n = len(x)
    if n > batch:
        raise ValueError(f"request of {n} windows exceeds max_batch {batch}")
    if n < batch:
        x = np.concatenate(
            [x, np.zeros((batch - n, *x.shape[1:]), x.dtype)], axis=0
        )
    return x, n


class DECPredictor:
    """Fixed-shape jitted DEC inference: windows -> (q, labels, z).

    `max_batch` fixes the compiled shape; smaller requests zero-pad (one
    compile at construction, none at request time). `transform` applies
    the training normalizer on device as part of the same jit.
    """

    def __init__(
        self,
        params,
        n_clusters: int,
        max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
    ):
        self.model = _models.DEC(n_clusters=n_clusters)
        self.params = params
        self.max_batch = max_batch
        normalize = make_normalizer(transform)

        @jax.jit
        def fn(params, x):
            q, _, z = self.model.apply({"params": params}, normalize(x))
            return q, jnp.argmax(q, axis=1), z

        self._fn = fn

    @classmethod
    def from_checkpoint(
        cls, path: str, n_clusters: int, max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
    ) -> "DECPredictor":
        from spectrogram_cube_clustering_tpu.train.checkpoint import restore

        template = _models.DEC(n_clusters=n_clusters).init(
            jax.random.key(0),
            jnp.zeros((1, _models.INPUT_HEIGHT, _models.INPUT_WIDTH, 1)),
        )["params"]
        return cls(
            restore(path, template), n_clusters, max_batch, transform
        )

    def warmup(self) -> None:
        """Pay the compile before serving traffic."""
        x = np.zeros(
            (self.max_batch, _models.INPUT_HEIGHT, _models.INPUT_WIDTH, 1),
            np.float32,
        )
        q, _, _ = self._fn(self.params, jnp.asarray(x))
        q.block_until_ready()

    def __call__(self, windows: np.ndarray) -> Dict[str, np.ndarray]:
        x, n = _pad_to(np.asarray(windows, np.float32), self.max_batch)
        q, labels, z = self._fn(self.params, jnp.asarray(x))
        return {
            "q": np.asarray(q[:n]),
            "labels": np.asarray(labels[:n]),
            "z": np.asarray(z[:n]),
        }


class AECEncoder:
    """Fixed-shape jitted encoder: windows -> latents (M, 9)."""

    def __init__(
        self,
        params,
        max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
    ):
        self.model = _models.AEC()
        self.params = params
        self.max_batch = max_batch
        normalize = make_normalizer(transform)

        @jax.jit
        def fn(params, x):
            return self.model.apply(
                {"params": params}, normalize(x), method="encode"
            )

        self._fn = fn

    @classmethod
    def from_checkpoint(
        cls, path: str, max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
    ) -> "AECEncoder":
        from spectrogram_cube_clustering_tpu.train.checkpoint import restore

        template = _models.AEC().init(
            jax.random.key(0),
            jnp.zeros((1, _models.INPUT_HEIGHT, _models.INPUT_WIDTH, 1)),
        )["params"]
        return cls(restore(path, template), max_batch, transform)

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        x, n = _pad_to(np.asarray(windows, np.float32), self.max_batch)
        z = self._fn(self.params, jnp.asarray(x))
        return np.asarray(z[:n])
