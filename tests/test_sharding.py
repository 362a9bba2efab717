"""Distributed-equivalence tests (SURVEY.md §4 item 3): the sharded train
step must match the single-device step up to reduction order, and sharded
DEC must reach the same clustering. Plus bf16/f32 numerics tolerances
(SURVEY.md §4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectrogram_cube_clustering_tpu as scc


@pytest.fixture(scope="module")
def windows():
    x, y = scc.data.synthetic_windows(256, n_classes=3, seed=11)
    return np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x))), y


class TestShardedTraining:
    def test_aec_epoch_matches_single_device(self, windows):
        x, _ = windows
        mesh = scc.core.make_data_mesh()
        model = scc.models.AEC()

        def run(mesh_arg):
            data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh_arg)
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            out = scc.train.train_aec(
                model, state, data, None,
                scc.train.AECConfig(n_epochs=3, early_stopping=False),
            )
            return out["history"]["train"], out["state"].params

        losses_1, params_1 = run(None)
        losses_8, params_8 = run(mesh)
        np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            ),
            params_1, params_8,
        )

    def test_dec_clustering_matches_single_device(self, windows):
        x, y = windows
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = scc.core.make_data_mesh()
        model = scc.models.DEC(n_clusters=3)

        def run(mesh_arg):
            data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh_arg)
            state = scc.train.create_train_state(
                model, jax.random.key(1), jnp.asarray(x[:2]), lr=5e-4
            )
            out = scc.train.train_dec(
                model, state, data,
                scc.train.DECConfig(
                    n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
                    kmeans_n_init=4, kmeans_max_iter=50,
                ),
            )
            return out["labels"]

        labels_1 = run(None)
        labels_8 = run(mesh)
        # same clustering structure on both paths (labels may permute)
        assert nmi(labels_1, labels_8) > 0.99
        assert abs(nmi(y, labels_1) - nmi(y, labels_8)) < 0.01


class TestPackedSharded:
    """The MXU-packed flagship variant (arch=packed, models/packed.py)
    must hold the same sharded==unsharded equivalence as the parity
    models — VERDICT r3 weak #3: the 1.42x variant's multi-chip claim
    needs its own evidence, not inheritance from AEC/DEC."""

    def test_packed_aec_epoch_matches_single_device(self, windows):
        x, _ = windows
        mesh = scc.core.make_data_mesh()
        model = scc.models.PackedAEC()

        def run(mesh_arg):
            data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh_arg)
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            out = scc.train.train_aec(
                model, state, data, None,
                scc.train.AECConfig(n_epochs=3, early_stopping=False),
            )
            return out["history"]["train"], out["state"].params

        losses_1, params_1 = run(None)
        losses_8, params_8 = run(mesh)
        np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
        # packed's bigger matmuls reshuffle reduction order more than the
        # parity AEC's; Adam amplifies the f32 grad noise where v is tiny
        # (observed: 3/8192 params at 2e-5 abs after 3 epochs)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
            ),
            params_1, params_8,
        )

    def test_packed_dec_clustering_matches_single_device(self, windows):
        """PackedDEC's sharded segment scan + full-eval refresh path."""
        x, y = windows
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = scc.core.make_data_mesh()
        model = scc.models.PackedDEC(n_clusters=3)

        def run(mesh_arg):
            data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh_arg)
            state = scc.train.create_train_state(
                model, jax.random.key(1), jnp.asarray(x[:2]), lr=5e-4
            )
            out = scc.train.train_dec(
                model, state, data,
                scc.train.DECConfig(
                    n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
                    kmeans_n_init=4, kmeans_max_iter=50,
                ),
            )
            return out["labels"], out["history"]["total"]

        labels_1, hist_1 = run(None)
        labels_8, hist_8 = run(mesh)
        assert nmi(labels_1, labels_8) > 0.99
        assert abs(nmi(y, labels_1) - nmi(y, labels_8)) < 0.01
        np.testing.assert_allclose(hist_1, hist_8, rtol=1e-3)


class TestShardedStreaming:
    """VERDICT r1 #2: the streaming (larger-than-HBM) path must be
    mesh-aware — batches arrive sharded from the prefetch loader and the
    per-batch jitted steps run data-parallel."""

    @staticmethod
    def _loader_factory(x, batch, mesh):
        from spectrogram_cube_clustering_tpu.data import PrefetchLoader

        sharding = scc.core.batch_sharding(mesh, 4) if mesh is not None else None
        items = [x[i : i + 32] for i in range(0, len(x), 32)]

        def make_loader():
            return PrefetchLoader(
                lambda i: items[i], len(items), batch,
                num_workers=2, sharding=sharding,
            )

        return make_loader

    def test_aec_stream_matches_single_device(self, windows):
        x, _ = windows
        mesh = scc.core.make_data_mesh()
        model = scc.models.AEC()

        def run(mesh_arg):
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            if mesh_arg is not None:
                state = jax.device_put(
                    state, scc.core.replicated_sharding(mesh_arg)
                )
            out = scc.train.train_aec_stream(
                model, state, self._loader_factory(x, 64, mesh_arg),
                scc.train.AECConfig(n_epochs=3, early_stopping=False),
            )
            return out["history"]["train"], out["state"].params

        losses_1, params_1 = run(None)
        losses_8, params_8 = run(mesh)
        np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            ),
            params_1, params_8,
        )

    def test_aec_stream_bf16_wire_sharded_matches_unsharded(self, windows):
        """transfer_dtype composes with mesh sharding: bf16 wire batches
        arrive sharded and the sharded run matches the single-device bf16
        run exactly (same quantization, same psum'd gradients)."""
        x, _ = windows
        mesh = scc.core.make_data_mesh()
        model = scc.models.AEC()

        def run(mesh_arg):
            from spectrogram_cube_clustering_tpu.data import PrefetchLoader

            sharding = (
                scc.core.batch_sharding(mesh_arg, 4)
                if mesh_arg is not None else None
            )
            items = [x[i : i + 32] for i in range(0, len(x), 32)]
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            if mesh_arg is not None:
                state = jax.device_put(
                    state, scc.core.replicated_sharding(mesh_arg)
                )
            out = scc.train.train_aec_stream(
                model, state,
                lambda: PrefetchLoader(
                    lambda i: items[i], len(items), 64, num_workers=2,
                    sharding=sharding, transfer_dtype="bfloat16",
                ),
                scc.train.AECConfig(n_epochs=2, early_stopping=False),
            )
            return out["history"]["train"]

        np.testing.assert_allclose(run(None), run(mesh), rtol=1e-4)

    def test_aec_stream_int8_wire_sharded_matches_unsharded(self, windows):
        """The int8 wire (per-sample scale headers) composes with mesh
        sharding: codes AND headers arrive batch-sharded, and the sharded
        run matches the single-device int8 run exactly (same
        quantization, same psum'd gradients)."""
        x, _ = windows
        mesh = scc.core.make_data_mesh()
        model = scc.models.AEC()

        def run(mesh_arg):
            from spectrogram_cube_clustering_tpu.data import PrefetchLoader

            sharding = (
                scc.core.batch_sharding(mesh_arg, 4)
                if mesh_arg is not None else None
            )
            items = [x[i : i + 32] for i in range(0, len(x), 32)]
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            if mesh_arg is not None:
                state = jax.device_put(
                    state, scc.core.replicated_sharding(mesh_arg)
                )
            out = scc.train.train_aec_stream(
                model, state,
                lambda: PrefetchLoader(
                    lambda i: items[i], len(items), 64, num_workers=2,
                    sharding=sharding, transfer_dtype="int8",
                ),
                scc.train.AECConfig(n_epochs=2, early_stopping=False),
            )
            return out["history"]["train"]

        np.testing.assert_allclose(run(None), run(mesh), rtol=1e-4)

    def test_dec_stream_matches_single_device(self, windows):
        x, y = windows
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = scc.core.make_data_mesh()
        model = scc.models.DEC(n_clusters=3)

        def run(mesh_arg):
            state = scc.train.create_train_state(
                model, jax.random.key(1), jnp.asarray(x[:2]), lr=5e-4
            )
            if mesh_arg is not None:
                state = jax.device_put(
                    state, scc.core.replicated_sharding(mesh_arg)
                )
            out = scc.train.train_dec_stream(
                model, state, self._loader_factory(x, 64, mesh_arg), len(x),
                scc.train.DECConfig(
                    n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
                    kmeans_n_init=4, kmeans_max_iter=50,
                ),
            )
            return out["labels"], out["history"]["total"]

        labels_1, hist_1 = run(None)
        labels_8, hist_8 = run(mesh)
        assert nmi(labels_1, labels_8) > 0.99
        np.testing.assert_allclose(hist_1, hist_8, rtol=1e-3)

    def test_stream_sharding_rejects_indivisible_batch(self):
        from spectrogram_cube_clustering_tpu.workflow.train import (
            _stream_sharding,
        )

        mesh = scc.core.make_data_mesh()
        with pytest.raises(ValueError, match="divisible"):
            _stream_sharding(None, mesh, 63)
        s = _stream_sharding(None, mesh, 64)
        assert s is not None and s.mesh.devices.size == mesh.devices.size


class TestPrecisionModes:
    def test_bf16_compute_close_to_f32(self, windows):
        x, _ = windows
        xj = jnp.asarray(x[:64])
        f32 = scc.models.AEC()
        bf16 = scc.models.AEC(dtype=jnp.bfloat16)
        params = f32.init(jax.random.key(2), xj[:2])["params"]
        xr32, z32 = f32.apply({"params": params}, xj)
        xr16, z16 = bf16.apply({"params": params}, xj)
        assert xr16.dtype == jnp.bfloat16 and z16.dtype == jnp.bfloat16
        # bf16 has ~3 decimal digits; activations should track f32 closely
        np.testing.assert_allclose(
            np.asarray(z16, np.float32), np.asarray(z32), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(xr16, np.float32), np.asarray(xr32), atol=0.05
        )


class TestMultiSliceMesh:
    def test_training_matches_1d_mesh(self, windows):
        """(2, 4) dcn x data mesh trains identically to the 1-D mesh."""
        x, _ = windows
        mesh_2d = scc.core.make_multislice_mesh(2)
        assert mesh_2d.devices.shape == (2, 4)
        mesh_1d = scc.core.make_data_mesh()
        model = scc.models.AEC()

        def run(mesh):
            data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh)
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            out = scc.train.train_aec(
                model, state, data, None,
                scc.train.AECConfig(n_epochs=2, early_stopping=False),
            )
            return out["history"]["train"]

        np.testing.assert_allclose(run(mesh_1d), run(mesh_2d), rtol=1e-4)

    def test_rejects_uneven_slices(self):
        with pytest.raises(ValueError, match="do not split"):
            scc.core.make_multislice_mesh(3)
