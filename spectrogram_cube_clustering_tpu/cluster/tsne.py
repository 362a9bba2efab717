"""t-SNE embedding for analysis figures (host-side).

Reference: Cluster/models.py:1325-1350 — 2-D t-SNE with perplexity = M/100,
learning_rate = M/12, early_exaggeration = 20, 2000 iterations, seed 2009
(cuML if CUDA else sklearn). t-SNE sits off the training path (figures
only), so the rebuild keeps it on host sklearn with identical
hyperparameters; sklearn >= 1.5 renamed n_iter to max_iter, both are
handled.
"""

from __future__ import annotations

import numpy as np


def tsne(data, *, seed: int = 2009, n_iter: int = 2000) -> np.ndarray:
    """2-D t-SNE of data (M, D) with the reference's hyperparameters."""
    from sklearn.manifold import TSNE

    data = np.asarray(data, dtype=np.float32)
    m = len(data)
    perplexity = max(min(int(m / 100), m - 1), 1)
    kwargs = dict(
        n_components=2,
        perplexity=perplexity,
        early_exaggeration=20,
        learning_rate=max(int(m / 12), 1),
        verbose=0,
        random_state=seed,
    )
    try:
        model = TSNE(max_iter=n_iter, **kwargs)
    except TypeError:  # sklearn < 1.5
        model = TSNE(n_iter=n_iter, **kwargs)
    return model.fit_transform(data)
