"""Analysis figures.

Re-implementations of the reference's figure families
(Cluster/plotting.py, 1977 LoC) with matplotlib on the Agg backend; all
functions return the Figure and never block (the reference's `show=True`
path is preserved as a flag). Figure families and their reference anchors:

- `view_tsne`            — t-SNE scatter by class (plotting.py:1947-1977)
- `view_silhscore`       — silhouette fill plot (plotting.py:1760-1802)
- `view_history_aec`     — AEC train/val curves (plotting.py:1336-1357)
- `view_history_dec`     — DEC loss/delta curves (plotting.py:1357-1388)
- `view_learning_curve`  — train vs val MSE (plotting.py:1574-1598)
- `view_specgram_training` — input/recon panels (plotting.py:1805-1944)
- `view_latent_space`    — sorted latent heatmap (plotting.py:1391-1571)
- `cluster_gallery`      — per-class nearest samples + centroid decodes
                           (plotting.py:306-522)
- `view_centroid_output` — decoded centroid spectrograms
                           (plotting.py:771-797)
- `view_class_cdf` / `view_class_pdf` — distance-to-centroid distributions
                           (plotting.py:800-994)
- `view_cluster_stats`   — K diagnostics (inertia/silhouette) over a K list
                           (plotting.py:1170-1221)
- `view_dec_output`      — single-sample input/latent/recon panel
                           (plotting.py:1224-1262)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg", force=False)

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def cmap_lifeaquatic(n: Optional[int] = None) -> list:
    """Categorical palette. The reference ships a fixed 14-color list
    (plotting.py:136-159); this uses an equivalent-size qualitative set,
    cycling if more classes are requested."""
    base = [
        "#1C366B", "#C4CFD0", "#EE3536", "#6EA2D5", "#F3A583",
        "#10A674", "#A41D80", "#F7C530", "#5C2D91", "#95CACA",
        "#B54A32", "#3E6F5D", "#D98CB3", "#707070",
    ]
    if n is None:
        return base
    return [base[i % len(base)] for i in range(n)]


def _finish(fig, show: bool):
    if show:  # pragma: no cover - interactive path
        plt.show()
    else:
        plt.close(fig)
    return fig


def _img(ax, x2d, cmap="viridis"):
    ax.imshow(np.asarray(x2d), aspect="auto", origin="lower", cmap=cmap)
    ax.set_xticks([])
    ax.set_yticks([])


def _to_hw(x) -> np.ndarray:
    """Accept (H, W), (H, W, 1) or (1, H, W) and return (H, W)."""
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[..., 0] if x.shape[-1] == 1 else x[0]
    return x


def view_tsne(results, labels, title, show: bool = False):
    """t-SNE scatter colored by class (reference view_TSNE,
    plotting.py:1947-1977)."""
    labels = np.asarray(labels)
    classes = np.unique(labels)
    colors = cmap_lifeaquatic(len(classes))
    fig, ax = plt.subplots(figsize=(6, 8))
    for j, c in enumerate(classes):
        sel = labels == c
        ax.plot(
            results[sel, 0], results[sel, 1], "o", alpha=0.2, c=colors[j],
            ms=6, mec="w", mew=0.5, rasterized=True, label=str(int(c) + 1),
        )
    ax.axis("off")
    leg = ax.legend(
        loc="center left", bbox_to_anchor=(0.9, 0.75), title="Class"
    )
    for handle in leg.legend_handles:
        handle.set_alpha(1)
    ax.set_title(title)
    return _finish(fig, show)


def view_silhscore(scores, labels, n_clusters, modeltype, show: bool = False):
    """Per-class sorted silhouette fill plot (reference view_silhscore,
    plotting.py:1760-1802)."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    colors = cmap_lifeaquatic(n_clusters)
    fig, ax = plt.subplots(figsize=(8, max(n_clusters, 2)), dpi=150)
    ax.set_ylim([0, scores.shape[0] + (n_clusters + 1) * 10])
    y_lower = 10
    for j in range(n_clusters):
        cs = np.sort(scores[labels == j])
        y_upper = y_lower + len(cs)
        ax.fill_betweenx(
            np.arange(y_lower, y_upper), 0, cs,
            facecolor=colors[j], edgecolor=colors[j], alpha=0.7,
        )
        ax.text(-0.05, y_lower + 0.5 * len(cs), str(j + 1), size=14)
        y_lower = y_upper + 10
    ax.axvline(float(np.mean(scores)), color="red", linestyle="--")
    ax.set_title(f"Silhouette Analysis for {modeltype}")
    ax.set_xlabel("Silhouette Coefficient")
    ax.set_ylabel("Class")
    ax.set_yticks([])
    ax.set_xticks(np.round(np.linspace(-1, 1, 11), 1))
    return _finish(fig, show)


def view_history_aec(history: Dict[str, Sequence], show: bool = False):
    """AEC training/validation MSE curves (reference view_history_AEC,
    plotting.py:1336-1357). `history` has keys epoch/train/validation."""
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(history["epoch"], history["train"], label="Training")
    ax.plot(history["epoch"], history["validation"], label="Validation")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("MSE")
    ax.set_title("AEC Training History")
    ax.legend()
    return _finish(fig, show)


view_learning_curve = view_history_aec  # plotting.py:1574-1598 variant


def view_history_dec(
    history: Dict[str, Sequence],
    deltas: Optional[Dict[str, Sequence]] = None,
    show: bool = False,
):
    """DEC loss components + delta-label curves (reference view_history_DEC,
    plotting.py:1357-1388)."""
    n_rows = 2 if deltas else 1
    fig, axes = plt.subplots(n_rows, 1, figsize=(8, 4 * n_rows), squeeze=False)
    ax = axes[0, 0]
    ax.plot(history["iteration"], history["total"], label="Loss")
    ax.plot(history["iteration"], history["reconstruction"], label="MSE")
    ax.plot(history["iteration"], history["clustering"], label="KLD")
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Loss")
    ax.set_title("DEC Training History")
    ax.legend()
    if deltas:
        ax2 = axes[1, 0]
        ax2.plot(deltas["iteration"], deltas["delta"], "o-")
        ax2.set_xlabel("Iteration")
        ax2.set_ylabel(r"$\delta$ (changed labels)")
    fig.tight_layout()
    return _finish(fig, show)


def view_specgram_training(
    x, x_rec, n_samples: int = 4, figtitle: str = "Reconstructions",
    show: bool = False,
):
    """Input vs reconstruction spectrogram panels (reference
    view_specgram_training, plotting.py:1838-1944)."""
    x = np.asarray(x)
    x_rec = np.asarray(x_rec)
    n = min(n_samples, len(x))
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 5), squeeze=False)
    for i in range(n):
        _img(axes[0, i], _to_hw(x[i]))
        _img(axes[1, i], _to_hw(x_rec[i]))
        axes[0, i].set_title(f"#{i}")
    axes[0, 0].set_ylabel("Input")
    axes[1, 0].set_ylabel("Reconstruction")
    fig.suptitle(figtitle)
    return _finish(fig, show)


def view_latent_space(z, labels=None, show: bool = False):
    """Latent-space heatmap, rows sorted by label (reference
    view_latent_space, plotting.py:1391-1571)."""
    z = np.asarray(z)
    order = np.argsort(np.asarray(labels)) if labels is not None else slice(None)
    fig, ax = plt.subplots(figsize=(6, 8))
    im = ax.imshow(z[order], aspect="auto", cmap="viridis", interpolation="none")
    ax.set_xlabel("Latent dimension")
    ax.set_ylabel("Sample (sorted by class)" if labels is not None else "Sample")
    fig.colorbar(im, ax=ax, label="Activation")
    ax.set_title("Latent Space")
    return _finish(fig, show)


def view_centroid_output(centroid_decodes, show: bool = False):
    """Decoded centroid spectrograms (reference view_centroid_output,
    plotting.py:771-797)."""
    xc = np.asarray(centroid_decodes)
    k = len(xc)
    fig, axes = plt.subplots(1, k, figsize=(3 * k, 3), squeeze=False)
    for j in range(k):
        _img(axes[0, j], _to_hw(xc[j]))
        axes[0, j].set_title(f"Centroid {j + 1}")
    fig.suptitle("Decoded Centroids")
    return _finish(fig, show)


def cluster_gallery(
    x, z, labels, centroids,
    centroid_decodes=None, n_examples: int = 4, show: bool = False,
):
    """Per-class gallery: samples nearest to the centroid, plus the decoded
    centroid when given (reference cluster_gallery, plotting.py:306-522)."""
    x = np.asarray(x)
    z = np.asarray(z)
    labels = np.asarray(labels)
    centroids = np.asarray(centroids)
    k = len(centroids)
    cols = n_examples + (1 if centroid_decodes is not None else 0)
    fig, axes = plt.subplots(k, cols, figsize=(2.2 * cols, 2.2 * k), squeeze=False)
    for j in range(k):
        sel = np.flatnonzero(labels == j)
        col = 0
        if centroid_decodes is not None:
            _img(axes[j, 0], _to_hw(np.asarray(centroid_decodes)[j]), cmap="magma")
            axes[j, 0].set_title("centroid" if j == 0 else "")
            col = 1
        if len(sel):
            d = np.linalg.norm(z[sel] - centroids[j], axis=1)
            nearest = sel[np.argsort(d)[:n_examples]]
            for i, idx in enumerate(nearest):
                _img(axes[j, col + i], _to_hw(x[idx]))
        for i in range(cols):
            if i == 0:
                axes[j, i].set_ylabel(f"Class {j + 1}")
    fig.suptitle("Cluster Gallery")
    fig.tight_layout()
    return _finish(fig, show)


def view_class_cdf(z, labels, centroids, p: int = 2, show: bool = False):
    """CDF of sample distance to own centroid per class (reference
    view_class_cdf, plotting.py:800-884)."""
    z = np.asarray(z)
    labels = np.asarray(labels)
    centroids = np.asarray(centroids)
    k = len(centroids)
    colors = cmap_lifeaquatic(k)
    fig, ax = plt.subplots(figsize=(7, 5))
    for j in range(k):
        sel = labels == j
        if not np.any(sel):
            continue
        d = np.sort(
            np.linalg.norm(z[sel] - centroids[j], ord=p, axis=1)
        )
        ax.plot(
            d, np.arange(1, len(d) + 1) / len(d),
            color=colors[j], label=f"Class {j + 1}",
        )
    ax.set_xlabel(f"L{p} distance to centroid")
    ax.set_ylabel("CDF")
    ax.set_title("Distance-to-Centroid CDF")
    ax.legend()
    return _finish(fig, show)


def view_class_pdf(z, labels, centroids, p: int = 2, bins: int = 50,
                   show: bool = False):
    """Histogram/PDF of distance to own centroid per class (reference
    view_class_pdf, plotting.py:885-994)."""
    z = np.asarray(z)
    labels = np.asarray(labels)
    centroids = np.asarray(centroids)
    k = len(centroids)
    colors = cmap_lifeaquatic(k)
    fig, axes = plt.subplots(k, 1, figsize=(7, 2 * k), squeeze=False, sharex=True)
    for j in range(k):
        sel = labels == j
        ax = axes[j, 0]
        if np.any(sel):
            d = np.linalg.norm(z[sel] - centroids[j], ord=p, axis=1)
            ax.hist(d, bins=bins, density=True, color=colors[j], alpha=0.8)
        ax.set_ylabel(f"Class {j + 1}")
    axes[-1, 0].set_xlabel(f"L{p} distance to centroid")
    fig.suptitle("Distance-to-Centroid PDF")
    return _finish(fig, show)


def view_cluster_stats(
    k_list, inertia, silh, show: bool = False
):
    """Cluster-count diagnostics: inertia + mean silhouette vs K (reference
    view_cluster_stats, plotting.py:1170-1221; the gap statistic inputs are
    optional there and omitted here)."""
    fig, ax1 = plt.subplots(figsize=(7, 5))
    ax1.plot(k_list, inertia, "o-", color="tab:blue", label="Inertia")
    ax1.set_xlabel("Number of clusters K")
    ax1.set_ylabel("Inertia", color="tab:blue")
    ax2 = ax1.twinx()
    ax2.plot(k_list, silh, "s--", color="tab:red", label="Silhouette")
    ax2.set_ylabel("Mean silhouette", color="tab:red")
    ax1.set_title("Cluster-Count Diagnostics")
    return _finish(fig, show)


def view_dec_output(x, label, x_rec, z, idx: int = 0, show: bool = False):
    """Single-sample input/latent/reconstruction panel (reference
    view_DEC_output, plotting.py:1224-1262)."""
    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    _img(axes[0], _to_hw(np.asarray(x)))
    axes[0].set_title(f"Input #{idx} (class {int(label) + 1})")
    axes[1].bar(np.arange(len(z)), np.asarray(z))
    axes[1].set_title("Latent")
    _img(axes[2], _to_hw(np.asarray(x_rec)))
    axes[2].set_title("Reconstruction")
    return _finish(fig, show)


def compare_silhscore(
    scores_z, scores_x, labels, n_clusters, xlim=(-1, 1), show: bool = False
):
    """Side-by-side latent/data-space silhouette plots (reference
    compare_silhscore, plotting.py:562-640)."""
    labels = np.asarray(labels)
    colors = cmap_lifeaquatic(n_clusters)
    fig, axes = plt.subplots(
        1, 2, figsize=(12, max(n_clusters, 2)), sharey=True
    )
    for ax, scores, name in (
        (axes[0], np.asarray(scores_z), "Latent Space"),
        (axes[1], np.asarray(scores_x), "Data Space"),
    ):
        y_lower = 10
        for j in range(n_clusters):
            cs = np.sort(scores[labels == j])
            y_upper = y_lower + len(cs)
            ax.fill_betweenx(
                np.arange(y_lower, y_upper), 0, cs,
                facecolor=colors[j], edgecolor=colors[j], alpha=0.7,
            )
            y_lower = y_upper + 10
        ax.axvline(float(np.mean(scores)), color="red", linestyle="--")
        ax.set_title(name)
        ax.set_xlim(list(xlim))
        ax.set_xlabel("Silhouette Coefficient")
        ax.set_yticks([])
    return _finish(fig, show)


def centroid_dashboard(z, labels, centroids, p: int = 2, show: bool = False):
    """Per-class distance summaries: box plot of distance-to-centroid plus
    inter-centroid distance matrix (reference centroid_dashboard,
    plotting.py:162-284)."""
    z = np.asarray(z)
    labels = np.asarray(labels)
    centroids = np.asarray(centroids)
    k = len(centroids)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    dists = [
        np.linalg.norm(z[labels == j] - centroids[j], ord=p, axis=1)
        for j in range(k)
    ]
    axes[0].boxplot(
        [d if len(d) else [0.0] for d in dists],
        tick_labels=[str(j + 1) for j in range(k)],
    )
    axes[0].set_xlabel("Class")
    axes[0].set_ylabel(f"L{p} distance to centroid")
    axes[0].set_title("Within-class distances")
    cc = np.linalg.norm(
        centroids[:, None, :] - centroids[None, :, :], ord=p, axis=2
    )
    im = axes[1].imshow(cc, cmap="viridis")
    axes[1].set_title("Inter-centroid distances")
    axes[1].set_xticks(range(k))
    axes[1].set_yticks(range(k))
    fig.colorbar(im, ax=axes[1])
    return _finish(fig, show)


def view_specgram(
    x, tvec=None, fvec=None, figtitle: str = "Spectrogram", show: bool = False
):
    """Spectrogram panel with physical time/freq axes when provided
    (reference view_specgram, plotting.py:1805-1836)."""
    x2d = _to_hw(np.asarray(x))
    fig, ax = plt.subplots(figsize=(8, 4))
    extent = None
    if tvec is not None and fvec is not None:
        extent = [tvec[0], tvec[-1], fvec[0], fvec[-1]]
    im = ax.imshow(
        x2d, aspect="auto", origin="lower", cmap="viridis", extent=extent
    )
    ax.set_xlabel("Time (s)" if tvec is not None else "Time bin")
    ax.set_ylabel("Frequency (Hz)" if fvec is not None else "Frequency bin")
    ax.set_title(figtitle)
    fig.colorbar(im, ax=ax, label="log power")
    return _finish(fig, show)


def view_detections(
    fname_dataset, img_index, figsize=(12, 9), show: bool = False
):
    """Gallery of catalog samples: spectrogram + trace per index (reference
    view_detections, plotting.py:1265-1333)."""
    import json

    import h5py

    n = len(img_index)
    fig, axes = plt.subplots(2, n, figsize=figsize, squeeze=False)
    with h5py.File(fname_dataset, "r") as f:
        spec_d = f["/4.0/Spectrogram"]
        trace_d = f["/4.0/Trace"]
        cat_d = f["/4.0/Catalogue"]
        for i, idx in enumerate(img_index):
            spec = np.asarray(spec_d[idx])[:-1, 1:]
            trace = np.asarray(trace_d[idx])
            meta = json.loads(cat_d[idx])
            _img(axes[0, i], spec)
            axes[0, i].set_title(f"{meta.get('Station', '?')} #{idx}")
            axes[1, i].plot(trace, lw=0.5)
            axes[1, i].set_xticks([])
    axes[0, 0].set_ylabel("Spectrogram")
    axes[1, 0].set_ylabel("Trace")
    return _finish(fig, show)


def view_series(
    station: str,
    aws: str,
    path_to_data: str,
    path_to_catalogue: str,
    path_to_labels: str,
    env_vars=("tide", "sea_ice_conc", "temp", "wind_spd"),
    times=None,
    freq: str = "month",
    threshold=None,
    log: bool = False,
    figsize=(12, 9),
    show: bool = False,
):
    """Environmental series stacked over per-class detection counts
    (reference view_series, plotting.py:1601-1757)."""
    from spectrogram_cube_clustering_tpu.analysis.catalogue import (
        EnvironmentCatalogue,
        LabelCatalogue,
    )

    df_env = EnvironmentCatalogue(station, aws, path_to_data).df
    catalogue = LabelCatalogue(
        [path_to_catalogue, path_to_labels], threshold=threshold
    )
    counts = catalogue.gather_counts(station=station, freq=freq)
    if times is not None:
        df_env = df_env.loc[(df_env.index >= times[0]) & (df_env.index <= times[1])]
        counts = counts.loc[(counts.index >= times[0]) & (counts.index <= times[1])]

    env_vars = [v for v in env_vars if v in df_env.columns]
    n_rows = len(env_vars) + 1
    fig, axes = plt.subplots(n_rows, 1, figsize=figsize, sharex=True, squeeze=False)
    for i, var in enumerate(env_vars):
        axes[i, 0].plot(df_env.index, df_env[var], lw=0.8)
        axes[i, 0].set_ylabel(var)
    ax = axes[-1, 0]
    colors = cmap_lifeaquatic(counts.shape[1])
    for j, col in enumerate(counts.columns):
        ax.plot(counts.index, counts[col], color=colors[j], label=f"Class {col}")
    if log:
        ax.set_yscale("log")
    ax.set_ylabel(f"Detections / {freq}")
    ax.legend(ncol=min(counts.shape[1], 5), fontsize=8)
    fig.suptitle(f"{station} — environment vs class activity")
    return _finish(fig, show)


def analyze_dec(
    x, z_aec, z_dec, labels_gmm, labels_dec, centroids_gmm, centroids_dec,
    tsne_results, epoch: int = 0, centroid_decodes=None, show: bool = False,
):
    """DEC snapshot figure set (reference analyze_dec, plotting.py:31-133):
    t-SNE, gallery, latent space, CDF, PDF — returned as a dict keyed by
    the reference's figure-directory names."""
    return {
        "T-SNE": view_tsne(
            tsne_results, labels_dec, f"t-SNE Results - Epoch {epoch}", show
        ),
        "Gallery": cluster_gallery(
            x, z_dec, labels_dec, centroids_dec,
            centroid_decodes=centroid_decodes, show=show,
        ),
        "LatentSpace": view_latent_space(z_dec, labels_dec, show),
        "CDF": view_class_cdf(z_dec, labels_dec, centroids_dec, show=show),
        "PDF": view_class_pdf(z_dec, labels_dec, centroids_dec, show=show),
    }


def save_figures(figs: dict, base_dir: str, epoch=None, dpi: int = 300):
    """Persist an analyze_dec figure dict into the reference's directory
    layout (<base>/<name>/<name>[_epoch].png; models.py:663-701)."""
    import os

    paths = []
    suffix = f"_{epoch:03d}" if epoch is not None else ""
    for name, fig in figs.items():
        d = os.path.join(base_dir, name)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{name}{suffix}.png")
        fig.savefig(p, dpi=dpi, facecolor="w")
        paths.append(p)
    return paths


def plotter_async(figs: dict, base_dir: str, epoch=None):
    """Run save_figures on a background thread (the reference's plotting
    thread is commented out because pyplot isn't thread-safe,
    models.py:1041-1046; figure *saving* on Agg is)."""
    import threading

    t = threading.Thread(
        target=save_figures, args=(figs, base_dir, epoch), daemon=True
    )
    t.start()
    return t


def compare_images(x, x_rec, idx: int = 0, show: bool = False):
    """Original vs reconstruction pair with a difference panel (reference
    compare_images, plotting.py:525-559)."""
    a = _to_hw(np.asarray(x)[idx] if np.asarray(x).ndim == 4 else x)
    b = _to_hw(np.asarray(x_rec)[idx] if np.asarray(x_rec).ndim == 4 else x_rec)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    _img(axes[0], a)
    axes[0].set_title("Original")
    _img(axes[1], b)
    axes[1].set_title("Reconstruction")
    _img(axes[2], a - b, cmap="coolwarm")
    axes[2].set_title("Difference")
    return _finish(fig, show)


def centroid_distances(z, labels, centroids, p: int = 2, show: bool = False):
    """Mean within-class distance to each centroid as a bar chart
    (reference centroid_distances, plotting.py:287-303)."""
    z = np.asarray(z)
    labels = np.asarray(labels)
    centroids = np.asarray(centroids)
    k = len(centroids)
    means = []
    for j in range(k):
        sel = labels == j
        means.append(
            float(np.linalg.norm(z[sel] - centroids[j], ord=p, axis=1).mean())
            if np.any(sel) else 0.0
        )
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(np.arange(1, k + 1), means, color=cmap_lifeaquatic(k))
    ax.set_xlabel("Class")
    ax.set_ylabel(f"Mean L{p} distance to centroid")
    ax.set_title("Centroid Distances")
    return _finish(fig, show)
