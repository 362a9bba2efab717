"""Clustering parity tests vs sklearn on synthetic blobs (SURVEY.md §4:
"GMM-EM vs sklearn parity on synthetic blobs (NMI/ARI >= 0.99)")."""

import numpy as np
import pytest

from sklearn.cluster import KMeans as SKKMeans
from sklearn.datasets import make_blobs
from sklearn.metrics import (
    adjusted_rand_score,
    normalized_mutual_info_score,
    silhouette_samples as sk_silhouette_samples,
)
from sklearn.mixture import GaussianMixture

from spectrogram_cube_clustering_tpu import cluster


@pytest.fixture(scope="module")
def blobs():
    # 9-D latent-like blobs, 5 clusters (the reference's K default).
    x, y = make_blobs(
        n_samples=1200, n_features=9, centers=5, cluster_std=1.0,
        random_state=2009,
    )
    return x.astype(np.float32), y


class TestKMeans:
    def test_matches_truth_and_sklearn(self, blobs):
        x, y = blobs
        labels, centers = cluster.kmeans(x, 5, n_init=10, max_iter=100)
        labels = np.asarray(labels)
        assert normalized_mutual_info_score(y, labels) >= 0.99
        sk = SKKMeans(n_clusters=5, n_init=10, random_state=2009).fit(x)
        assert normalized_mutual_info_score(sk.labels_, labels) >= 0.99
        # centroid sets match up to permutation
        d = np.linalg.norm(
            np.asarray(centers)[:, None] - sk.cluster_centers_[None], axis=-1
        )
        assert d.min(axis=1).max() < 0.15

    def test_deterministic(self, blobs):
        x, _ = blobs
        l1, c1 = cluster.kmeans(x, 5, n_init=4, max_iter=50, seed=7)
        l2, c2 = cluster.kmeans(x, 5, n_init=4, max_iter=50, seed=7)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_k2(self):
        rng = np.random.default_rng(0)
        x = np.concatenate(
            [rng.normal(-3, 0.3, (100, 2)), rng.normal(3, 0.3, (100, 2))]
        ).astype(np.float32)
        labels, centers = cluster.kmeans(x, 2, n_init=4, max_iter=50)
        labels = np.asarray(labels)
        assert (labels[:100] == labels[0]).all()
        assert (labels[100:] == labels[100]).all()
        assert labels[0] != labels[100]


class TestGMM:
    def test_parity_with_sklearn(self, blobs):
        x, y = blobs
        labels, centroids = cluster.gmm(x, 5, n_init=10)
        labels = np.asarray(labels)
        assert normalized_mutual_info_score(y, labels) >= 0.99
        assert adjusted_rand_score(y, labels) >= 0.99

        km = SKKMeans(n_clusters=5, n_init=10, random_state=2009).fit(x)
        counts = np.bincount(km.labels_, minlength=5)
        sk = GaussianMixture(
            n_components=5, max_iter=1000, n_init=1,
            weights_init=counts / len(x), means_init=km.cluster_centers_,
        )
        sk_labels = sk.fit_predict(x.astype(np.float64))
        assert normalized_mutual_info_score(sk_labels, labels) >= 0.99
        d = np.linalg.norm(
            np.asarray(centroids)[:, None] - sk.means_[None], axis=-1
        )
        assert d.min(axis=1).max() < 0.2

    def test_em_improves_likelihood_and_converges(self, blobs):
        x, _ = blobs
        km_labels, km_centers = cluster.kmeans(x, 5, n_init=4, max_iter=50)
        w = np.bincount(np.asarray(km_labels), minlength=5) / len(x)
        labels, state = cluster.gmm_em(x, w, np.asarray(km_centers))
        assert bool(state.converged)
        assert int(state.n_iter) < 1000
        assert np.isfinite(float(state.lower_bound))
        np.testing.assert_allclose(float(np.asarray(state.weights).sum()), 1.0, rtol=1e-5)

    def test_empty_component_stays_finite(self, blobs):
        """K above the data's natural cluster count can leave a component
        with ~zero responsibility; its covariance must degrade to
        reg_covar*I, not 0/0 = NaN (review r2)."""
        x, _ = blobs
        # two tight far-apart blobs, K=4: two components starve
        rng = np.random.default_rng(0)
        z = np.concatenate([
            rng.normal(size=(200, 4)).astype(np.float32) * 0.05,
            rng.normal(size=(200, 4)).astype(np.float32) * 0.05 + 50.0,
        ])
        labels, means = cluster.gmm(z, 4, n_init=4, kmeans_max_iter=50)
        assert np.isfinite(np.asarray(means)).all()
        labels = np.asarray(labels)
        assert len(labels) == len(z)
        # the two real blobs are still separated
        assert len(set(labels[:200]) & set(labels[200:])) == 0

    def test_predict_matches_fit_labels(self, blobs):
        x, _ = blobs
        km_labels, km_centers = cluster.kmeans(x, 5, n_init=4, max_iter=50)
        w = np.bincount(np.asarray(km_labels), minlength=5) / len(x)
        labels, state = cluster.gmm_em(x, w, np.asarray(km_centers))
        pred = cluster.gmm_predict(x, state)
        assert (np.asarray(pred) == np.asarray(labels)).mean() > 0.999


class TestSilhouette:
    def test_matches_sklearn(self, blobs):
        x, y = blobs
        got = np.asarray(cluster.silhouette_samples(x, y, 5, chunk=256))
        want = sk_silhouette_samples(x, y)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_unpadded_chunk_boundary(self, blobs):
        x, y = blobs
        # chunk that doesn't divide M exercises the padding path
        got = np.asarray(cluster.silhouette_samples(x, y, 5, chunk=999))
        want = sk_silhouette_samples(x, y)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_flattens_spectrogram_input(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(64, 1, 4, 10)).astype(np.float32)
        y = rng.integers(0, 2, size=64)
        got = np.asarray(cluster.silhouette_samples(x, y, 2, chunk=16))
        want = sk_silhouette_samples(x.reshape(64, -1), y)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_single_cluster_raises(self, blobs):
        """One populated cluster made b = inf and NaN'd every score into
        cluster_performance.csv silently; like sklearn, refuse loudly
        (review r3 — a collapsed fit should be visible)."""
        x, y = blobs
        with pytest.raises(ValueError, match="populated clusters"):
            cluster.silhouette_samples(x, np.zeros_like(y), 5)

    def test_multichannel_nhwc_layout(self):
        """(M, H, W, C>1) NHWC input must stride H and W — the old
        shape[-1]==1 check misrouted it to the NCHW branch, striding the
        H axis as if it were channels (review r3)."""
        from spectrogram_cube_clustering_tpu.cluster.metrics import (
            silhouette_samples_X,
        )

        rng = np.random.default_rng(2)
        x = rng.normal(size=(64, 8, 10, 3)).astype(np.float32)
        y = rng.integers(0, 2, size=64)
        got, x_ = silhouette_samples_X(x, y, rf=2)
        assert x_.shape == (64, 4, 5)  # H and W strided, channel 0 taken
        want = sk_silhouette_samples(
            x[:, ::2, ::2, 0].reshape(64, -1), y
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        # NCHW still routes through the channel-first branch
        got_c, xc = silhouette_samples_X(
            np.moveaxis(x, -1, 1), y, rf=2
        )
        assert xc.shape == (64, 4, 5)
        np.testing.assert_allclose(got_c, want, rtol=1e-3, atol=1e-4)


class TestTSNE:
    def test_smoke_shapes_and_determinism(self):
        rng = np.random.default_rng(0)
        x = np.concatenate(
            [rng.normal(-2, 0.2, (60, 9)), rng.normal(2, 0.2, (60, 9))]
        ).astype(np.float32)
        e1 = cluster.tsne(x, n_iter=260)
        e2 = cluster.tsne(x, n_iter=260)
        assert e1.shape == (120, 2)
        np.testing.assert_allclose(e1, e2, atol=1e-4)


def test_gap_statistic_accepts_iterator(blobs):
    """len(list(it)) used to exhaust a generator k_list and silently
    return uninitialized np.empty garbage (review r2)."""
    from spectrogram_cube_clustering_tpu.cluster import gap_statistic

    z, _ = blobs
    z = z[:120]
    from_gen = gap_statistic(
        z, (k for k in (2, 3)), n_refs=2, n_init=2, max_iter=20
    )
    from_list = gap_statistic(z, [2, 3], n_refs=2, n_init=2, max_iter=20)
    for key in ("inertia", "gap_g", "gap_u"):
        np.testing.assert_allclose(from_gen[key], from_list[key])
        assert np.isfinite(from_gen[key]).all()


class TestMetricsSubsample:
    def test_degenerate_labels_degrade_to_nan(self, blobs, tmp_path, capsys):
        """A single populated cluster in a metrics pass degrades to NaN
        scores with a loud note instead of aborting the run (review r3
        second pass: the new silhouette ValueError was unhandled by its
        in-pipeline callers)."""
        from spectrogram_cube_clustering_tpu.cluster import cluster_metrics

        z, y = blobs
        x = np.tile(z[:, :4, None, None], (1, 1, 4, 5)).astype(np.float32)
        out = cluster_metrics(
            str(tmp_path), np.zeros_like(y), x, z, save=True
        )
        assert np.isnan(out["silh_scores_Z"]).all()
        assert "silhouette skipped" in capsys.readouterr().out

    def test_silh_cap(self, blobs, tmp_path):
        from spectrogram_cube_clustering_tpu.cluster import cluster_metrics

        z, y = blobs
        x = np.tile(z[:, :4, None, None], (1, 1, 4, 5)).astype(np.float32)
        out = cluster_metrics(
            str(tmp_path), y, x, z, save=True, silh_max_samples=40
        )
        silh = out["silh_scores_Z"]
        assert np.isnan(silh).sum() == len(y) - 40
        assert np.isfinite(out["class_silh_Z"]).all()
        assert np.isfinite(out["df"].loc["mean", "silh_score_Z"])


class TestTSNEJax:
    def test_recovers_blob_structure(self, rng):
        from sklearn.cluster import KMeans
        from sklearn.metrics import normalized_mutual_info_score as nmi

        from spectrogram_cube_clustering_tpu.cluster import tsne_jax

        k, d, m = 4, 10, 400
        centers = rng.normal(size=(k, d)) * 8
        y = rng.integers(0, k, m)
        x = (centers[y] + rng.normal(size=(m, d))).astype(np.float32)
        emb = tsne_jax(x, n_iter=500)
        assert emb.shape == (m, 2)
        assert np.isfinite(emb).all()
        lab = KMeans(k, n_init=10, random_state=0).fit_predict(emb)
        assert nmi(y, lab) > 0.95

    def test_oversized_uses_landmark_interpolation(self, rng):
        """VERDICT r1 #6: beyond max_samples, tsne_jax switches to the
        landmark method (exact subsample + k-NN placement) and still
        recovers blob structure at full M."""
        from sklearn.cluster import KMeans
        from sklearn.metrics import normalized_mutual_info_score as nmi

        from spectrogram_cube_clustering_tpu.cluster import tsne_jax

        k, d, m = 4, 10, 3000
        centers = rng.normal(size=(k, d)) * 8
        y = rng.integers(0, k, m)
        x = (centers[y] + rng.normal(size=(m, d))).astype(np.float32)
        emb = tsne_jax(x, n_iter=500, max_samples=800)  # forces landmarks
        assert emb.shape == (m, 2)
        assert np.isfinite(emb).all()
        lab = KMeans(k, n_init=10, random_state=0).fit_predict(emb)
        assert nmi(y, lab) > 0.95

    def test_row_chunking_matches_single_chunk(self, rng):
        """The (chunk, M)-scratch row-chunked P construction and gradient
        loop (the exact path's HBM story at the 30k cap) must reproduce
        the single-chunk (dense) math."""
        import jax
        import jax.numpy as jnp

        from spectrogram_cube_clustering_tpu.cluster.tsne_jax import (
            _joint_p,
            _optimize,
        )

        m, d = 150, 6  # not a multiple of the chunk -> exercises padding
        x = rng.normal(size=(m, d)).astype(np.float32)
        # _joint_p returns ROW-PADDED P (pad rows exactly zero) so the
        # optimizer never holds a second full-size copy
        p_dense = _joint_p(jnp.asarray(x), jnp.float32(5.0), chunk=256)
        p_chunk = _joint_p(jnp.asarray(x), jnp.float32(5.0), chunk=64)
        assert p_dense.shape == (256, m) and p_chunk.shape == (192, m)
        np.testing.assert_array_equal(np.asarray(p_dense[m:]), 0.0)
        np.testing.assert_allclose(
            np.asarray(p_chunk[:m]), np.asarray(p_dense[:m]),
            rtol=1e-5, atol=1e-12,
        )

        # few iterations: the gradient math must match chunked vs dense;
        # long runs amplify f32 reduction-order noise chaotically, so a
        # trajectory comparison is only meaningful over a short horizon
        y0 = 1e-4 * jax.random.normal(jax.random.key(0), (m, 2), jnp.float32)
        y_dense, kl_dense = _optimize(
            p_dense, y0, jnp.float32(10.0), jnp.float32(12.0), 5,
            chunk=256,
        )
        y_chunk, kl_chunk = _optimize(
            p_dense, y0, jnp.float32(10.0), jnp.float32(12.0), 5,
            chunk=64,
        )
        np.testing.assert_allclose(
            np.asarray(y_chunk), np.asarray(y_dense), rtol=1e-3, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(kl_chunk), np.asarray(kl_dense), rtol=1e-3
        )

    def test_landmark_direct_small_falls_back_to_exact(self, rng):
        from spectrogram_cube_clustering_tpu.cluster import (
            tsne_jax,
            tsne_jax_landmark,
        )

        x = rng.normal(size=(120, 5)).astype(np.float32)
        a = tsne_jax_landmark(x, n_landmarks=200, n_iter=250)
        b = tsne_jax(x, n_iter=250)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_landmark_rejects_max_samples_kwarg(self, rng):
        """max_samples would collide with the internal landmark caps; the
        clean TypeError beats the old 'multiple values for keyword'."""
        from spectrogram_cube_clustering_tpu.cluster import tsne_jax_landmark

        x = rng.normal(size=(64, 5)).astype(np.float32)
        with pytest.raises(TypeError, match="n_landmarks"):
            tsne_jax_landmark(x, max_samples=32)
