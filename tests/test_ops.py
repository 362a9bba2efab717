"""Unit tests for ops: normalizers, Student-t assignment, target
distribution, and losses — golden values from independent numpy references
(SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_cube_clustering_tpu import ops


class TestNormalizers:
    def test_sample_norm_cent_golden(self, rng):
        x = rng.normal(size=(3, 4, 101)).astype(np.float32)
        got = np.asarray(ops.sample_norm_cent(jnp.asarray(x)))
        for i in range(3):
            want = (x[i] - x[i].mean()) / (np.abs(x[i]).max() + 1e-8)
            np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-7)

    def test_sample_normalization_golden(self, rng):
        x = rng.normal(size=(2, 4, 101)).astype(np.float32)
        got = np.asarray(ops.sample_normalization(jnp.asarray(x)))
        for i in range(2):
            np.testing.assert_allclose(
                got[i], x[i] / np.abs(x[i]).max(), rtol=1e-6
            )
        assert np.abs(got).max() == pytest.approx(1.0, abs=1e-6)

    def test_vec_norm_golden(self, rng):
        x = rng.normal(size=(2, 4, 101)).astype(np.float32)
        got = np.asarray(ops.vec_norm(jnp.asarray(x)))
        for i in range(2):
            want = x[i] / (np.linalg.norm(x[i].ravel()) + 1e-8)
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-7)

    def test_broadcasts_over_window_batches(self, rng):
        # Zarr path applies per 4-row window inside a (B, n_specs, 4, W) stack.
        x = rng.normal(size=(2, 5, 4, 101)).astype(np.float32)
        got = np.asarray(ops.sample_norm_cent(jnp.asarray(x)))
        want = np.asarray(ops.sample_norm_cent(jnp.asarray(x[1, 3])))
        np.testing.assert_allclose(got[1, 3], want, rtol=1e-6)

    def test_nhwc_matches_hw(self, rng):
        # NHWC (B, H, W, 1) must normalize over the full (H, W) window,
        # identically to the channel-less layout.
        x = rng.normal(size=(3, 4, 101)).astype(np.float32)
        for fn in (ops.sample_norm_cent, ops.sample_normalization, ops.vec_norm):
            got = np.asarray(fn(jnp.asarray(x[..., None])))[..., 0]
            want = np.asarray(fn(jnp.asarray(x)))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_make_normalizer_dispatch(self):
        assert ops.make_normalizer(None)(jnp.ones((4, 4))).sum() == 16
        with pytest.raises(ValueError):
            ops.make_normalizer("bogus")


class TestStudentT:
    def test_rows_sum_to_one(self, rng):
        z = jnp.asarray(rng.normal(size=(32, 9)).astype(np.float32))
        mu = jnp.asarray(rng.normal(size=(5, 9)).astype(np.float32))
        q = ops.student_t_assignment(z, mu)
        np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, rtol=1e-6)

    def test_golden_numpy(self, rng):
        z = rng.normal(size=(16, 9)).astype(np.float64)
        mu = rng.normal(size=(5, 9)).astype(np.float64)
        alpha = 1.0
        d2 = ((z[:, None, :] - mu[None]) ** 2).sum(-1)
        w = (1.0 + d2 / alpha) ** (-(alpha + 1) / 2)
        want = w / w.sum(1, keepdims=True)
        got = np.asarray(
            ops.student_t_assignment(
                jnp.asarray(z, jnp.float32), jnp.asarray(mu, jnp.float32)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_nearest_centroid_dominates(self):
        mu = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
        z = jnp.asarray([[0.1, 0.0], [9.9, 10.0]])
        q = np.asarray(ops.student_t_assignment(z, mu))
        assert q[0, 0] > 0.9 and q[1, 1] > 0.9


class TestTargetDistribution:
    def test_golden_numpy(self, rng):
        # Independent numpy transcription of models.py:1302-1322.
        q = rng.uniform(0.01, 1.0, size=(64, 5))
        q = q / q.sum(1, keepdims=True)
        p = q**2 / q.sum(0)
        p = (p.T / p.sum(1)).T
        want = np.round(p, 5)
        got = np.asarray(
            ops.target_distribution(jnp.asarray(q, jnp.float32))
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_unrounded_rows_sum_to_one(self, rng):
        q = jnp.asarray(rng.dirichlet(np.ones(5), size=64).astype(np.float32))
        p = ops.target_distribution(q, round_decimals=None)
        np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)

    def test_sharpens_assignments(self):
        # With balanced clusters, confident rows get more confident.
        q = jnp.asarray([[0.9, 0.1], [0.1, 0.9]], jnp.float32)
        p = np.asarray(ops.target_distribution(q, round_decimals=None))
        assert p[0, 0] > 0.9 and p[1, 1] > 0.9


class TestLosses:
    def test_mse_matches_numpy(self, rng):
        a = rng.normal(size=(8, 4, 101, 1)).astype(np.float32)
        b = rng.normal(size=(8, 4, 101, 1)).astype(np.float32)
        got = float(ops.mse(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(((a - b) ** 2).mean(), rel=1e-5)

    def test_kld_matches_torch_convention(self, rng):
        torch = pytest.importorskip("torch")
        p = rng.dirichlet(np.ones(5), size=32).astype(np.float32)
        p[0, :2] = [0.0, p[0, :2].sum()]  # exercise zero-target handling
        q = rng.dirichlet(np.ones(5), size=32).astype(np.float32)
        want = float(
            torch.nn.KLDivLoss(reduction="sum")(
                torch.log(torch.from_numpy(q)), torch.from_numpy(p)
            )
        )
        got = float(ops.kld_sum(jnp.asarray(p), jnp.asarray(q)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_dec_loss_composition(self, rng):
        x = jnp.asarray(rng.normal(size=(16, 4, 101, 1)).astype(np.float32))
        xr = x + 0.1
        q = jnp.asarray(rng.dirichlet(np.ones(5), size=16).astype(np.float32))
        p = ops.target_distribution(q, round_decimals=None)
        total, (rec, clust) = ops.dec_loss(xr, x, q, p, gamma=0.001)
        assert float(total) == pytest.approx(float(rec) + float(clust), rel=1e-6)
        assert float(rec) == pytest.approx(0.01, rel=1e-4)

    def test_dec_loss_mask_equals_unpadded(self, rng):
        """dec_loss with a pad mask must equal dec_loss on the valid rows
        alone — this is the loss train_dec optimizes on a ragged final
        batch (train/dec.py:_dec_loss delegates here)."""
        x = jnp.asarray(rng.normal(size=(16, 4, 101, 1)).astype(np.float32))
        xr = jnp.asarray(rng.normal(size=(16, 4, 101, 1)).astype(np.float32))
        q = jnp.asarray(rng.dirichlet(np.ones(5), size=16).astype(np.float32))
        p = ops.target_distribution(q, round_decimals=None)
        mask = jnp.asarray([1.0] * 10 + [0.0] * 6, jnp.float32)
        got, (rec_m, clust_m) = ops.dec_loss(xr, x, q, p, 0.001, mask=mask)
        want, (rec, clust) = ops.dec_loss(
            xr[:10], x[:10], q[:10], p[:10], 0.001
        )
        assert float(got) == pytest.approx(float(want), rel=1e-6)
        assert float(rec_m) == pytest.approx(float(rec), rel=1e-6)
        assert float(clust_m) == pytest.approx(float(clust), rel=1e-6)
