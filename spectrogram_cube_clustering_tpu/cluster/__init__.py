"""On-device clustering: k-means, GMM-EM, silhouette, t-SNE.

TPU-native replacements for the reference's sklearn/cuML calls
(Cluster/models.py:21-29, 365-413, 546-574, 1271-1350): k-means restarts are
vmapped and run under jit; GMM-EM sufficient statistics are matmuls on the
MXU; silhouette is a chunked pairwise-distance scan. t-SNE comes in two
flavors: host sklearn (`tsne`, the reference's path) and an on-device
exact implementation (`tsne_jax`, 32x faster at M=8k on one v5e).
"""

from spectrogram_cube_clustering_tpu.cluster.kmeans import kmeans
from spectrogram_cube_clustering_tpu.cluster.gmm import gmm, gmm_em, gmm_predict, GMMState
from spectrogram_cube_clustering_tpu.cluster.silhouette import silhouette_samples
from spectrogram_cube_clustering_tpu.cluster.tsne import tsne
from spectrogram_cube_clustering_tpu.cluster.tsne_jax import (
    tsne_jax,
    tsne_jax_landmark,
)
from spectrogram_cube_clustering_tpu.cluster.metrics import (
    cluster_metrics,
    gap_statistic,
    silhouette_samples_X,
)

__all__ = [
    "kmeans", "gmm", "gmm_em", "gmm_predict", "GMMState",
    "silhouette_samples", "tsne", "tsne_jax", "tsne_jax_landmark", "cluster_metrics",
    "gap_statistic", "silhouette_samples_X",
]
