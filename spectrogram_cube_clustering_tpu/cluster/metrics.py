"""Clustering-quality metrics.

Parity target: `cluster_metrics` / `silhouette_samples_X`
(Cluster/models.py:237-362, 1271-1299) — per class: sample counts, inner
product to the class mean, MSE/MAE to the class mean, and silhouette scores
in latent (Z) and data (X, decimated by RF) spaces; writes 7 `.npy` files
and `cluster_performance.csv`.

The silhouettes run on-device (cluster.silhouette); the per-class moments
are a handful of small reductions done in numpy.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from spectrogram_cube_clustering_tpu.cluster.silhouette import silhouette_samples


def _silhouette_or_nan(x, labels, n_clusters: int, context: str) -> np.ndarray:
    """silhouette_samples, degrading LOUDLY to NaN scores when the labels
    carry fewer than 2 populated clusters (silhouette_samples raises like
    sklearn there) — a degenerate class in a metrics pass must not abort
    the whole prediction run after its expensive forward passes."""
    try:
        return np.asarray(silhouette_samples(x, labels, n_clusters))
    except ValueError as e:
        print(f"silhouette skipped ({context}): {e}")
        return np.full(len(np.asarray(labels)), np.nan, np.float32)


def silhouette_samples_X(
    x: np.ndarray, labels: np.ndarray, rf: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Data-space silhouettes on an RF-decimated grid
    (reference models.py:1271-1299).

    x is (M, H, W, C) or (M, C, H, W); the trailing spatial axes are
    strided by RF before flattening. Layout detection: the channel axis
    is the smaller of axes 1 and 3 (C is 1-4, H is the spectrogram's
    rows) — keying on shape[-1] == 1 alone misrouted multi-channel NHWC
    to the NCHW branch, striding H as if it were channels.
    """
    if x.ndim == 4:
        if x.shape[-1] <= x.shape[1]:  # NHWC
            x_ = x[:, :: int(rf), :: int(rf), 0]
        else:                          # NCHW
            x_ = x[:, 0, :: int(rf), :: int(rf)]
    else:
        x_ = x[:, :: int(rf), :: int(rf)]
    m = x_.shape[0]
    flat = x_.reshape(m, -1)
    k = int(np.max(labels)) + 1
    scores = np.asarray(silhouette_samples(flat, labels, k))
    return scores, x_


def gap_statistic(
    z: np.ndarray,
    k_list,
    n_refs: int = 5,
    seed: int = 2009,
    n_init: int = 4,
    max_iter: int = 100,
) -> Dict[str, np.ndarray]:
    """Tibshirani gap statistic over a K sweep, against BOTH null reference
    distributions the reference's view_cluster_stats plots
    (plotting.py:1170-1221 takes gap_g gaussian / gap_u uniform series;
    nothing in the reference tree computes them — this closes that gap).

    Gap(K) = E[log W_K(null)] - log W_K(data), with W_K the k-means
    within-cluster dispersion (inertia). Returns {"inertia", "gap_g",
    "gap_u"} arrays aligned with k_list; fits run on-device
    (cluster.kmeans).
    """
    from spectrogram_cube_clustering_tpu.cluster.kmeans import kmeans

    z = np.asarray(z, np.float32)
    rng = np.random.default_rng(seed)
    lo, hi = z.min(axis=0), z.max(axis=0)
    mu, sd = z.mean(axis=0), z.std(axis=0) + 1e-12

    def _inertia(data, k):
        # the jitted fit already computed the winning restart's inertia;
        # re-deriving it on host would broadcast a full (M, K, D)
        _, _, inertia = kmeans(
            data, int(k), n_init=n_init, max_iter=max_iter, seed=seed,
            return_inertia=True,
        )
        return float(inertia)

    k_list = list(k_list)  # materialize ONCE — an iterator would be
    # exhausted by len() and the loop below would fill nothing
    inertia = np.empty(len(k_list))
    gap_g = np.empty_like(inertia)
    gap_u = np.empty_like(inertia)
    for i, k in enumerate(k_list):
        inertia[i] = _inertia(z, k)
        log_w = np.log(max(inertia[i], 1e-30))
        refs_g = [
            np.log(max(_inertia(
                (rng.standard_normal(z.shape) * sd + mu).astype(np.float32), k
            ), 1e-30))
            for _ in range(n_refs)
        ]
        refs_u = [
            np.log(max(_inertia(
                rng.uniform(lo, hi, z.shape).astype(np.float32), k
            ), 1e-30))
            for _ in range(n_refs)
        ]
        gap_g[i] = np.mean(refs_g) - log_w
        gap_u[i] = np.mean(refs_u) - log_w
    return {"inertia": inertia, "gap_g": gap_g, "gap_u": gap_u}


def cluster_metrics(
    path: Optional[str],
    labels: np.ndarray,
    x: np.ndarray,
    z: np.ndarray,
    save: bool = True,
    rf: int = 3,
    silh_max_samples: Optional[int] = None,
    seed: int = 2009,
) -> Dict[str, np.ndarray]:
    """Compute per-class clustering metrics; optionally persist them.

    Returns a dict with keys N, X_ip, X_MSE, X_MSE_avg, X_MAE, X_MAE_avg,
    silh_scores_Z, silh_scores_X, class_silh_Z, class_silh_X, df.

    Silhouettes are O(M^2); `silh_max_samples` caps them on a seeded
    subsample for very large catalogs (scores for unsampled rows are NaN;
    class/overall means use sampled rows only). The reference decimates
    only the X features (RF), not the sample count, and cannot run at cube
    scale.
    """
    import pandas as pd

    labels = np.asarray(labels)
    classes = np.unique(labels)
    k = len(classes)

    n_clusters = int(np.max(labels)) + 1
    m = len(labels)
    if silh_max_samples is not None and m > silh_max_samples:
        sel = np.sort(
            np.random.default_rng(seed).choice(
                m, silh_max_samples, replace=False
            )
        )
        silh_z = np.full(m, np.nan, np.float32)
        silh_x = np.full(m, np.nan, np.float32)
        # the subsample can lose a small class entirely -> degrade to NaN
        # scores loudly instead of aborting the run
        silh_z[sel] = _silhouette_or_nan(
            np.asarray(z)[sel], labels[sel], n_clusters, "Z subsample"
        )
        try:
            silh_x[sel], _ = silhouette_samples_X(
                np.asarray(x)[sel], labels[sel], rf=rf
            )
        except ValueError as e:
            print(f"silhouette skipped (X subsample): {e}")
    else:
        silh_z = _silhouette_or_nan(
            np.asarray(z), labels, n_clusters, "Z"
        )
        try:
            silh_x, _ = silhouette_samples_X(np.asarray(x), labels, rf=rf)
        except ValueError as e:
            print(f"silhouette skipped (X): {e}")
            silh_x = np.full(m, np.nan, np.float32)

    x_flat = np.asarray(x).reshape(len(labels), -1)
    d = x_flat.shape[1]

    counts = np.zeros((k,), dtype=int)
    x_ip_avg = np.zeros((k,))
    x_mse = np.zeros((k, d))
    x_mae = np.zeros((k, d))
    x_mse_avg = np.zeros((k,))
    x_mae_avg = np.zeros((k,))
    class_silh_z = np.zeros((k,))
    class_silh_x = np.zeros((k,))

    for j, c in enumerate(classes):
        sel = labels == c
        xj = x_flat[sel]
        counts[j] = len(xj)
        mean = xj.mean(axis=0)
        x_ip_avg[j] = float(np.mean(xj @ mean))
        diff = xj - mean
        x_mse[j] = np.mean(diff * diff, axis=0)
        x_mae[j] = np.mean(np.abs(diff), axis=0)
        x_mse_avg[j] = float(np.mean(x_mse[j]))
        x_mae_avg[j] = float(np.mean(x_mae[j]))
        # all-NaN class silhouettes (degenerate labelings) degrade to NaN
        # without numpy's empty-slice RuntimeWarning
        class_silh_z[j] = (
            float(np.nanmean(silh_z[sel]))
            if np.isfinite(silh_z[sel]).any() else float("nan")
        )
        class_silh_x[j] = (
            float(np.nanmean(silh_x[sel]))
            if np.isfinite(silh_x[sel]).any() else float("nan")
        )

    df = pd.DataFrame(
        data={
            "class": classes,
            "N": counts,
            "inner_product": x_ip_avg,
            "MSE_avg": x_mse_avg,
            "MAE_avg": x_mae_avg,
            "silh_score_Z": class_silh_z,
            "silh_score_X": class_silh_x,
        }
    )
    df.loc["mean"] = df.mean(numeric_only=True)
    df.loc["mean", ["class", "N"]] = None
    # all-NaN silhouettes (degenerate single-class labelings) degrade to
    # NaN without tripping numpy's empty-slice RuntimeWarning
    df.loc["mean", "silh_score_Z"] = (
        float(np.nanmean(silh_z)) if np.isfinite(silh_z).any() else float("nan")
    )
    df.loc["mean", "silh_score_X"] = (
        float(np.nanmean(silh_x)) if np.isfinite(silh_x).any() else float("nan")
    )

    if save:
        if path is None:
            raise ValueError("save=True requires a path")
        np.save(os.path.join(path, "X_ip"), x_ip_avg)
        np.save(os.path.join(path, "X_MSE"), x_mse)
        np.save(os.path.join(path, "X_MSE_avg"), x_mse_avg)
        np.save(os.path.join(path, "X_MAE"), x_mae)
        np.save(os.path.join(path, "X_MAE_avg"), x_mae_avg)
        np.save(os.path.join(path, "silh_scores_Z"), silh_z)
        np.save(os.path.join(path, "silh_scores_X"), silh_x)
        df.to_csv(os.path.join(path, "cluster_performance.csv"))

    return {
        "N": counts,
        "X_ip": x_ip_avg,
        "X_MSE": x_mse,
        "X_MSE_avg": x_mse_avg,
        "X_MAE": x_mae,
        "X_MAE_avg": x_mae_avg,
        "silh_scores_Z": silh_z,
        "silh_scores_X": silh_x,
        "class_silh_Z": class_silh_z,
        "class_silh_X": class_silh_x,
        "df": df,
    }
