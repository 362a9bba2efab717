"""Shape/dtype contract tests for the networks (SURVEY.md §4 item 1):
4x101 -> 9 -> 4x101 for AEC/DEC, 16-d bottleneck for UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import models


@pytest.fixture(scope="module")
def x8():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(8, 4, 101, 1)).astype(np.float32))


class TestAEC:
    def test_shapes(self, x8):
        m = models.AEC()
        params = m.init(jax.random.key(0), x8)
        x_rec, z = m.apply(params, x8)
        assert x_rec.shape == (8, 4, 101, 1)
        assert z.shape == (8, 9)

    def test_latent_nonnegative(self, x8):
        # Encoder ends in ReLU (networks.py:185).
        m = models.AEC()
        params = m.init(jax.random.key(1), x8)
        _, z = m.apply(params, x8)
        assert (np.asarray(z) >= 0).all()

    def test_encode_method(self, x8):
        m = models.AEC()
        params = m.init(jax.random.key(0), x8)
        z = m.apply(params, x8, method=m.encode)
        _, z2 = m.apply(params, x8)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))

    def test_custom_latent_dim(self, x8):
        m = models.AEC(latent_dim=16)
        params = m.init(jax.random.key(0), x8)
        x_rec, z = m.apply(params, x8)
        assert z.shape == (8, 16) and x_rec.shape == (8, 4, 101, 1)

    def test_bias_init_constant(self, x8):
        params = models.AEC().init(jax.random.key(0), x8)
        bias = params["params"]["encoder"]["Conv_0"]["bias"]
        np.testing.assert_allclose(np.asarray(bias), 0.01)


class TestDEC:
    def test_shapes_and_simplex(self, x8):
        m = models.DEC(n_clusters=5)
        params = m.init(jax.random.key(0), x8)
        q, x_rec, z = m.apply(params, x8)
        assert q.shape == (8, 5)
        assert x_rec.shape == (8, 4, 101, 1)
        assert z.shape == (8, 9)
        np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, rtol=1e-5)

    def test_replace_centroids(self, x8):
        from spectrogram_cube_clustering_tpu.models.dec import replace_centroids

        m = models.DEC(n_clusters=5)
        params = m.init(jax.random.key(0), x8)
        new_c = np.arange(45, dtype=np.float32).reshape(5, 9)
        p2 = dict(params)
        p2["params"] = replace_centroids(params["params"], new_c)
        np.testing.assert_array_equal(
            np.asarray(p2["params"]["centroids"]), new_c
        )

    def test_encoder_transfer_from_aec(self, x8):
        from spectrogram_cube_clustering_tpu.models.dec import (
            load_encoder_decoder_from_aec,
        )

        aec = models.AEC()
        aec_params = aec.init(jax.random.key(7), x8)["params"]
        dec = models.DEC(n_clusters=5)
        dec_vars = dec.init(jax.random.key(0), x8)
        dec_params = load_encoder_decoder_from_aec(
            dec_vars["params"], aec_params
        )
        q, x_rec, z = dec.apply({"params": dec_params}, x8)
        _, z_aec = aec.apply({"params": aec_params}, x8)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_aec), rtol=1e-6
        )


class TestUNet:
    def test_shapes(self, x8):
        m = models.UNet()
        params = m.init(jax.random.key(0), x8)
        x_rec, z = m.apply(params, x8)
        assert x_rec.shape == (8, 4, 101, 1)
        assert z.shape == (8, 16)

    def test_latent_in_unit_interval(self, x8):
        # Bottleneck is sigmoid-gated (networks.py:45-67).
        m = models.UNet()
        params = m.init(jax.random.key(0), x8)
        _, z = m.apply(params, x8)
        z = np.asarray(z)
        assert (z > 0).all() and (z < 1).all()

    def test_latent_dim_is_live(self, x8):
        """UNet(latent_dim=32) must actually produce a 32-d latent — the
        field used to be dead (bottleneck hardwired to n_in//256 = 16,
        review r3), silently running a narrower latent than configured."""
        m = models.UNet(latent_dim=32)
        params = m.init(jax.random.key(0), x8)
        x_rec, z = m.apply(params, x8)
        assert z.shape == (8, 32)
        assert x_rec.shape == (8, 4, 101, 1)


class TestLayout:
    def test_nchw_roundtrip(self, x8):
        nchw = models.to_nchw(x8)
        assert nchw.shape == (8, 1, 4, 101)
        np.testing.assert_array_equal(
            np.asarray(models.from_nchw(nchw)), np.asarray(x8)
        )


class TestPacked:
    """MXU-packed variant (models/packed.py): same task contract as
    AEC/DEC with (2,2) space-to-depth packing — 1.42x the parity AEC on
    v5e (benchmarks/RESULTS.md contraction-width experiment)."""

    def test_space_to_depth_roundtrip(self, rng):
        from spectrogram_cube_clustering_tpu.models.packed import (
            _depth_to_space,
            _space_to_depth,
        )

        x = jnp.asarray(rng.normal(size=(3, 4, 101, 1)).astype(np.float32))
        packed = _space_to_depth(x)
        assert packed.shape == (3, 2, 52, 4)
        np.testing.assert_array_equal(np.asarray(_depth_to_space(packed)),
                                      np.asarray(x))

    def test_packed_aec_shapes(self, x8):
        model = models.PackedAEC()
        params = model.init(jax.random.key(0), x8)
        xr, z = model.apply(params, x8)
        assert xr.shape == x8.shape
        assert z.shape == (len(x8), 9)
        assert np.isfinite(np.asarray(xr)).all()

    def test_packed_dec_contract(self, x8):
        from spectrogram_cube_clustering_tpu.models.dec import (
            load_encoder_decoder_from_aec,
            replace_centroids,
        )

        model = models.PackedDEC(n_clusters=5)
        params = model.init(jax.random.key(0), x8)["params"]
        q, xr, z = model.apply({"params": params}, x8)
        assert q.shape == (len(x8), 5)
        np.testing.assert_allclose(np.asarray(q).sum(axis=1), 1.0, atol=1e-5)
        assert xr.shape == x8.shape and z.shape == (len(x8), 9)
        # centroid injection + AEC weight transfer work unchanged
        cents = np.asarray(z)[:5]
        params = replace_centroids(params, jnp.asarray(cents))
        np.testing.assert_allclose(np.asarray(params["centroids"]), cents)
        aec = models.PackedAEC()
        aec_params = aec.init(jax.random.key(1), x8)["params"]
        merged = load_encoder_decoder_from_aec(params, aec_params)
        q2, _, z2 = model.apply({"params": merged}, x8)
        _, z_aec = aec.apply({"params": aec_params}, x8)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z_aec),
                                   atol=1e-6)
