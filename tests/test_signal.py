"""Signal/parallel tests: STFT parity, Pallas kernel (interpret mode),
halo-exchange sharded spectrogram on the 8-device CPU mesh, sharded
k-means step vs single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spectrogram_cube_clustering_tpu import parallel, signal
from spectrogram_cube_clustering_tpu.core import make_data_mesh
from spectrogram_cube_clustering_tpu.ops.pallas_stft import spectrogram_pallas


class TestSTFT:
    def test_matches_numpy_rfft(self, rng):
        x = rng.normal(size=(4_000,)).astype(np.float32)
        spec = np.asarray(signal.spectrogram(jnp.asarray(x), nperseg=200, hop=100))
        assert spec.shape == ((4_000 - 200) // 100 + 1, 101)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(200) / 200)
        for f in (0, 7, spec.shape[0] - 1):
            want = np.log10(
                np.abs(np.fft.rfft(x[f * 100 : f * 100 + 200] * win)) ** 2
                + 1e-12
            )
            np.testing.assert_allclose(spec[f], want, atol=2e-4)

    def test_frame(self, rng):
        x = rng.normal(size=(1_000,)).astype(np.float32)
        f = np.asarray(signal.frame(jnp.asarray(x), 200, 100))
        assert f.shape == (9, 200)
        np.testing.assert_array_equal(f[3], x[300:500])

    def test_batched(self, rng):
        x = rng.normal(size=(3, 2_000)).astype(np.float32)
        spec = np.asarray(signal.spectrogram(jnp.asarray(x)))
        assert spec.shape == (3, 19, 101)
        one = np.asarray(signal.spectrogram(jnp.asarray(x[1])))
        np.testing.assert_allclose(spec[1], one, atol=1e-5)

    def test_pallas_kernel_interpret(self, rng):
        x = rng.normal(size=(60_000,)).astype(np.float32)
        ref = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(spectrogram_pallas(jnp.asarray(x), interpret=True))
        assert got.shape == ref.shape
        # matmul-DFT vs FFT in f32: tiny log-scale drift is expected
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_pallas_kernel_nondefault_geometry(self, rng):
        x = rng.normal(size=(10_000,)).astype(np.float32)
        ref = np.asarray(signal.spectrogram(jnp.asarray(x), nperseg=256, hop=64))
        got = np.asarray(
            spectrogram_pallas(
                jnp.asarray(x), nperseg=256, hop=64, interpret=True,
                frames_per_block=64,
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_pallas_kernel_leftover_samples(self, rng):
        """n_frames an exact multiple of frames_per_block with leftover
        samples past the last full frame used to compute a NEGATIVE pad
        width and crash (review r2); the leftovers are dead weight and
        must simply be dropped."""
        # t=950: n_frames=8 == frames_per_block, rows_needed*hop=900 < t
        x = rng.normal(size=(950,)).astype(np.float32)
        ref = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(
            spectrogram_pallas(
                jnp.asarray(x), interpret=True, frames_per_block=8
            )
        )
        assert got.shape == ref.shape == (8, 101)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    @pytest.mark.parametrize(
        "nperseg,hop,t",
        [
            (100, 100, 5_003),   # ratio 1: frames never span rows
            (120, 40, 7_919),    # ratio 3, odd prime-ish t
            (192, 32, 6_144),    # ratio 6, t an exact row multiple
            (200, 100, 200),     # exactly one frame
            (160, 80, 9_760),    # tail lands exactly on a block edge
        ],
    )
    def test_pallas_kernel_geometry_fuzz(self, rng, nperseg, hop, t):
        """Rawread layout across ratio/tail alignments (interpret mode):
        main-grid vs all-tail splits, halo-aligned and ragged tails."""
        x = rng.normal(size=(t,)).astype(np.float32)
        ref = np.asarray(
            signal.spectrogram(jnp.asarray(x), nperseg=nperseg, hop=hop)
        )
        got = np.asarray(
            spectrogram_pallas(
                jnp.asarray(x), nperseg=nperseg, hop=hop, interpret=True,
                frames_per_block=32,
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_pallas_kernel_high_ratio_geometry(self, rng):
        """nperseg=128/hop=16 (ratio 8) — rejected by the old staged-plane
        eligibility bound, admitted by the rawread layout; the halo here
        (round_up(7, 8) = 8) exactly equals ratio-1+1, exercising frames
        whose overhang touches the halo block's last row."""
        x = rng.normal(size=(20_000,)).astype(np.float32)
        ref = np.asarray(signal.spectrogram(jnp.asarray(x), nperseg=128, hop=16))
        got = np.asarray(
            spectrogram_pallas(
                jnp.asarray(x), nperseg=128, hop=16, interpret=True,
                frames_per_block=256,
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_pallas_kernel_all_tail(self, rng):
        """t small enough that n_main=0: every frame runs through the
        tail call on the zero-padded slice (rawread layout)."""
        x = rng.normal(size=(1_100,)).astype(np.float32)
        ref = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(
            spectrogram_pallas(
                jnp.asarray(x), interpret=True, frames_per_block=512
            )
        )
        assert got.shape == ref.shape == (10, 101)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_spectrogram_windows_pallas_autoselect_fallback(self, rng, monkeypatch):
        """use_pallas=None on a TPU backend must NOT route configs the
        Pallas kernel rejects (nperseg % hop != 0, hop > 128) into it."""
        import jax as _jax

        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        x = rng.normal(size=(5_000,)).astype(np.float32)
        w = np.asarray(
            signal.spectrogram_windows(jnp.asarray(x), nperseg=250, hop=100)
        )
        assert w.shape[1:] == (4, 126, 1)
        w = np.asarray(
            signal.spectrogram_windows(jnp.asarray(x), nperseg=300, hop=150)
        )
        assert w.shape[1:] == (4, 151, 1)

    def test_spectrogram_windows_shapes(self, rng):
        x = rng.normal(size=(10_000,)).astype(np.float32)
        w = np.asarray(
            signal.spectrogram_windows(jnp.asarray(x), use_pallas=False)
        )
        n_frames = (10_000 - 200) // 100 + 1
        assert w.shape == (n_frames // 4, 4, 101, 1)
        # normalized per window
        assert np.abs(w.mean(axis=(1, 2, 3))).max() < 1e-5

    def test_spectrogram_windows_pallas_interpret_passthrough(self, rng):
        """use_pallas=True off-TPU needs interpret=True forwarded to the
        kernel (review r3: there was no passthrough, so the eligible-
        geometry path crashed on CPU backends); results match the XLA
        path."""
        x = rng.normal(size=(5_000,)).astype(np.float32)
        ref = np.asarray(
            signal.spectrogram_windows(jnp.asarray(x), use_pallas=False)
        )
        got = np.asarray(
            signal.spectrogram_windows(
                jnp.asarray(x), use_pallas=True, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_spectrogram_windows_loose_precision_optin(self, rng):
        """precision="default" (the opt-in loose variant, RESULTS.md
        "Loose-precision STFT variant") flows through to the kernel: same
        shapes/normalization; on CPU interpret mode DEFAULT dots are f32
        anyway so values match the parity path exactly. Bogus values are
        rejected at the kernel boundary."""
        import pytest

        x = rng.normal(size=(5_000,)).astype(np.float32)
        ref = np.asarray(
            signal.spectrogram_windows(
                jnp.asarray(x), use_pallas=True, interpret=True
            )
        )
        got = np.asarray(
            signal.spectrogram_windows(
                jnp.asarray(x), use_pallas=True, interpret=True,
                precision="default",
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)
        from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
            spectrogram_pallas,
        )

        with pytest.raises(ValueError, match="precision"):
            spectrogram_pallas(
                jnp.asarray(x), interpret=True, precision="loose"
            )

    def test_pallas_eligible_bounds_basis_vmem(self):
        """The resident hop-chunked bases (2*ratio*128*nfreq_pad f32)
        must fit the VMEM budget; nperseg=512/hop=8 needs ~25 MiB of
        bases and must fall back. nperseg=128/hop=16 (2 MiB) was
        rejected by the old staged-plane HBM bound but is fine under
        the round-3 rawread layout (no staging copies at all)."""
        from spectrogram_cube_clustering_tpu.signal.stft import (
            pallas_eligible,
        )

        assert pallas_eligible(200, 100, platform="tpu")   # 512 KiB
        assert pallas_eligible(256, 128, platform="tpu")   # 1 MiB
        assert pallas_eligible(128, 16, platform="tpu")    # 2 MiB
        assert not pallas_eligible(512, 8, platform="tpu")  # ~25 MiB


class TestShardedSpectrogram:
    def test_pallas_eligible_platform_override(self):
        """Kernel selection keys on the TARGET devices' platform, not the
        process default backend (review r3: a CPU mesh in a TPU-default
        process used to get a compiled Mosaic kernel)."""
        from spectrogram_cube_clustering_tpu.signal.stft import (
            pallas_eligible,
        )

        # conftest pins the default backend to cpu
        assert not pallas_eligible(200, 100)
        assert pallas_eligible(200, 100, platform="tpu")
        assert not pallas_eligible(200, 100, platform="cpu")
        assert not pallas_eligible(200, 33, platform="tpu")  # geometry

    def test_matches_single_device(self, rng):
        mesh = make_data_mesh()
        n_dev = mesh.devices.size
        assert n_dev == 8  # conftest pins the 8-device CPU mesh
        t = n_dev * 100 * 30  # multiple of mesh * hop
        x = rng.normal(size=(t,)).astype(np.float32)
        want = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(parallel.sharded_spectrogram(jnp.asarray(x), mesh))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_pallas_path_matches_single_device(self, rng):
        """The flagship composition: halo exchange + fused Pallas STFT
        per shard (interpret mode on the CPU mesh) must match the
        single-device XLA spectrogram — this is the path that runs at
        kernel throughput on real chips."""
        mesh = make_data_mesh()
        t = mesh.devices.size * 100 * 16
        x = rng.normal(size=(t,)).astype(np.float32)
        want = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(
            parallel.sharded_spectrogram(jnp.asarray(x), mesh, use_pallas=True)
        )
        assert got.shape == want.shape
        # matmul-DFT vs FFT in f32: tiny log-scale drift is expected
        np.testing.assert_allclose(got, want, atol=2e-3)

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_batched_multichannel(self, rng, use_pallas):
        """(C, T) multichannel input shards along time with the channel
        axis replicated; every channel matches its own single-device
        spectrogram (parity with signal.stft.spectrogram's batching)."""
        mesh = make_data_mesh()
        t = mesh.devices.size * 100 * 8
        x = rng.normal(size=(3, t)).astype(np.float32)
        want = np.asarray(signal.spectrogram(jnp.asarray(x)))
        got = np.asarray(
            parallel.sharded_spectrogram(
                jnp.asarray(x), mesh, use_pallas=use_pallas
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_pallas_rejects_bad_geometry(self):
        mesh = make_data_mesh()
        x = jnp.zeros((8 * 150 * 4,), jnp.float32)
        with pytest.raises(ValueError, match="pallas"):
            parallel.sharded_spectrogram(
                x, mesh, nperseg=250, hop=150, use_pallas=True
            )

    def test_rejects_misaligned_length(self, rng):
        mesh = make_data_mesh()
        x = jnp.zeros((12345,), jnp.float32)
        with pytest.raises(ValueError, match="multiple of mesh"):
            parallel.sharded_spectrogram(x, mesh)

    def test_rejects_halo_exceeding_shard(self):
        """nperseg - hop beyond the per-device shard would need a
        multi-hop halo exchange; must fail with a clear message, not an
        opaque trace error inside shard_map."""
        mesh = make_data_mesh()
        x = jnp.zeros((8 * 200,), jnp.float32)  # local_t=200 < halo=300
        with pytest.raises(ValueError, match="halo"):
            parallel.sharded_spectrogram(x, mesh, nperseg=400, hop=100)


class TestShardedKMeans:
    def test_step_matches_dense(self, rng):
        mesh = make_data_mesh()
        m, d, k = 8 * 64, 9, 5
        z = rng.normal(size=(m, d)).astype(np.float32)
        centers = z[rng.choice(m, k, replace=False)]
        labels, new = parallel.sharded_kmeans_step(
            jnp.asarray(z), jnp.asarray(centers), mesh
        )
        labels = np.asarray(labels)
        new = np.asarray(new)
        # dense reference
        d2 = ((z[:, None, :] - centers[None]) ** 2).sum(-1)
        want_labels = d2.argmin(1)
        np.testing.assert_array_equal(labels, want_labels)
        for j in range(k):
            if np.any(want_labels == j):
                np.testing.assert_allclose(
                    new[j], z[want_labels == j].mean(0), rtol=1e-4, atol=1e-5
                )


class TestWaveformWorkflow:
    def test_load_data_waveform(self, rng, tmp_path):
        """Config-driven raw-waveform -> STFT -> windows path."""
        import types

        from spectrogram_cube_clustering_tpu.workflow.data import load_data

        wave = rng.normal(size=(20_000,)).astype(np.float32)
        path = str(tmp_path / "wave.npy")
        np.save(path, wave)
        config = types.SimpleNamespace(
            model="AEC", mode="train", fname_dataset=path,
            datafiletype="waveform",
        )
        tra, val = load_data(config)
        n_frames = (20_000 - 200) // 100 + 1
        n_windows = n_frames // 4
        assert tra.shape[0] + val.shape[0] == n_windows
        assert tra.shape[1:] == (4, 101, 1)
        assert tuple(config.input_hw) == (4, 101)

    def test_nperseg_override_sets_input_hw(self, rng, tmp_path):
        """nperseg/hop/window_rows overrides flow into config.input_hw so
        make_model builds the matching geometry (round-3 review: the
        waveform path never set it, so non-default nperseg windows hit the
        fixed (4, 101) model and failed inside the first jitted step)."""
        import types

        import jax

        from spectrogram_cube_clustering_tpu.workflow.data import load_data
        from spectrogram_cube_clustering_tpu.workflow.train import make_model

        wave = rng.normal(size=(20_000,)).astype(np.float32)
        path = str(tmp_path / "wave.npy")
        np.save(path, wave)
        config = types.SimpleNamespace(
            model="AEC", mode="train", fname_dataset=path,
            datafiletype="waveform", nperseg=128, hop=64, window_rows=8,
        )
        tra, _ = load_data(config)
        assert tra.shape[1:] == (8, 65, 1)
        assert tuple(config.input_hw) == (8, 65)
        model = make_model(config)
        params = model.init(jax.random.key(0), jnp.asarray(tra[:2]))
        xr, z = model.apply(params, jnp.asarray(tra[:2]))
        assert xr.shape == (2, 8, 65, 1)


class TestShardedGMM:
    def test_em_step_matches_dense(self, rng):
        from spectrogram_cube_clustering_tpu.cluster.gmm import (
            _e_step,
            _m_step,
        )

        mesh = make_data_mesh()
        m, d, k = 8 * 48, 5, 3
        z = rng.normal(size=(m, d)).astype(np.float32)
        means = z[rng.choice(m, k, replace=False)]
        weights = np.full(k, 1.0 / k, np.float32)
        covs = np.stack([np.eye(d, dtype=np.float32)] * k)

        w8, mu8, cov8, lb8 = parallel.sharded_gmm_em_step(
            z, weights, means, covs, mesh
        )
        # dense reference: one E+M step
        lb, log_resp = _e_step(
            jnp.asarray(z), jnp.asarray(weights), jnp.asarray(means),
            jnp.asarray(covs),
        )
        wd, mud, covd = _m_step(jnp.asarray(z), log_resp, 1e-6)
        np.testing.assert_allclose(np.asarray(w8), np.asarray(wd), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mu8), np.asarray(mud), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cov8), np.asarray(covd), rtol=2e-2, atol=2e-4)
        np.testing.assert_allclose(float(lb8), float(lb), rtol=1e-4)

    def test_survives_empty_component(self, rng):
        """K above the populated cluster count (the gmm_fit n_clusters
        sweep does this) must not NaN-poison the fit: an empty component
        once produced a -mu.mu^T covariance whose Cholesky turned every
        responsibility NaN by the second iteration."""
        mesh = make_data_mesh()
        # two tight, well-separated blobs; ask for 4 components so the
        # k-means init leaves at least one empty/near-empty (4 may also
        # legitimately SPLIT a blob — so assert purity, not NMI)
        m = 8 * 64
        truth = np.arange(m) % 2
        z = (rng.normal(size=(m, 5)) * 0.01 + truth[:, None] * 10.0).astype(
            np.float32
        )
        labels, means = parallel.sharded_gmm(
            z, 4, mesh, max_iter=20, n_init=4, kmeans_n_iter=20
        )
        labels = np.asarray(labels)
        assert np.all(np.isfinite(np.asarray(means)))
        # every found cluster must sit inside ONE true blob: a NaN-poisoned
        # fit assigns rows of both blobs to the same (garbage) component
        for k in np.unique(labels):
            assert len(np.unique(truth[labels == k])) == 1

    def test_em_step_freezes_empty_component(self, rng):
        """Step-level check with a GUARANTEED-empty component (mean 1e4
        away -> zero responsibility mass): two chained EM steps must stay
        finite, and the empty component keeps its incoming mean/cov."""
        mesh = make_data_mesh()
        m, d = 8 * 32, 5
        z = rng.normal(size=(m, d)).astype(np.float32)
        means = np.vstack([z[:2], np.full((1, d), 1e4, np.float32)])
        weights = np.asarray([0.5, 0.5, 0.0], np.float32)
        covs = np.stack([np.eye(d, dtype=np.float32)] * 3)

        w, mu, cov, lb = parallel.sharded_gmm_em_step(
            z, weights, means, covs, mesh
        )
        w, mu, cov, lb = parallel.sharded_gmm_em_step(z, w, mu, cov, mesh)
        for a in (w, mu, cov, lb):
            assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(mu)[2], means[2])
        np.testing.assert_allclose(np.asarray(cov)[2], covs[2])
        assert float(np.asarray(w)[2]) < 1e-6


def test_pallas_kernel_hop_at_lane_boundary(rng):
    # hop == 128 exactly: no lane padding in the hop-row layout
    x = rng.normal(size=(12_000,)).astype(np.float32)
    ref = np.asarray(signal.spectrogram(jnp.asarray(x), nperseg=256, hop=128))
    got = np.asarray(
        spectrogram_pallas(
            jnp.asarray(x), nperseg=256, hop=128, interpret=True,
            frames_per_block=32,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


class TestShardedKMeansFull:
    def test_recovers_blobs(self, rng):
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = make_data_mesh()
        k, d = 4, 6
        centers_true = rng.normal(size=(k, d)).astype(np.float32) * 6
        y = rng.integers(0, k, size=8 * 96)
        z = centers_true[y] + rng.normal(size=(len(y), d)).astype(np.float32) * 0.3
        labels, centers = parallel.sharded_kmeans(
            jnp.asarray(z), k, mesh, n_iter=50, n_init=4, init_subsample=256
        )
        assert centers.shape == (k, d)
        assert nmi(y, np.asarray(labels)) > 0.99

    def test_sharded_kmeans_matches_dense_quality(self, rng):
        """VERDICT r1 #10: the subsample-init deviation from the
        reference's full-data n_init=100 restarts (models.py:386-391) must
        not cost clustering quality — sharded (subsample-init) and dense
        (full-data) paths agree to NMI > 0.99 on overlapping blobs."""
        from sklearn.metrics import normalized_mutual_info_score as nmi

        from spectrogram_cube_clustering_tpu import cluster as _cluster

        mesh = make_data_mesh()
        k, d = 5, 9
        centers_true = rng.normal(size=(k, d)).astype(np.float32) * 3
        y = rng.integers(0, k, size=8 * 2048)
        z = (
            centers_true[y]
            + rng.normal(size=(len(y), d)).astype(np.float32) * 0.8
        )
        labels_sh, _ = parallel.sharded_kmeans(
            jnp.asarray(z), k, mesh, n_init=20, init_subsample=2048
        )
        labels_dense, _ = _cluster.kmeans(z, k, n_init=20, max_iter=300)
        assert nmi(np.asarray(labels_dense), np.asarray(labels_sh)) > 0.99
        assert (
            abs(
                nmi(y, np.asarray(labels_sh))
                - nmi(y, np.asarray(labels_dense))
            )
            < 0.01
        )

    def test_kmeans_labels_consistent_with_returned_centers(self, rng):
        """The returned labels must be the assignment against the RETURNED
        centers (a closing assignment pass, like the dense kmeans) — not
        against the pre-update centers of the last iteration."""
        mesh = make_data_mesh()
        k, d = 4, 6
        z = rng.normal(size=(8 * 64, d)).astype(np.float32)
        # n_iter=1 maximizes the pre/post-update center gap
        labels, centers = parallel.sharded_kmeans(
            jnp.asarray(z), k, mesh, n_iter=1, n_init=2, init_subsample=128
        )
        labels, centers = np.asarray(labels), np.asarray(centers)
        d2 = ((z[:, None, :] - centers[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(labels, d2.argmin(axis=1))

    def test_sharded_gmm_large_mean_offset(self, rng):
        """Covariance stats are centered (review r2): the raw
        E[zz^T] - mu mu^T form cancels catastrophically in f32 when the
        latent mean dwarfs the spread, NaN-ing the Cholesky."""
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = make_data_mesh()
        k, d = 3, 5
        centers_true = rng.normal(size=(k, d)).astype(np.float32) * 2.0
        y = rng.integers(0, k, size=8 * 80)
        z = (
            centers_true[y]
            + rng.normal(size=(len(y), d)).astype(np.float32) * 0.1
            + 300.0  # mean >> spread
        ).astype(np.float32)
        labels, means = parallel.sharded_gmm(
            jnp.asarray(z), k, mesh, n_init=4, max_iter=30
        )
        assert np.isfinite(np.asarray(means)).all()
        assert nmi(y, np.asarray(labels)) > 0.99

    def test_ragged_length_pads_internally(self, rng):
        """Catalog lengths that don't divide the mesh are padded and
        masked internally (review r3: the raised 'pad or trim first'
        pushed an impossible precondition onto workflow.gmm_fit's mesh
        path, which passes raw catalogs)."""
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = make_data_mesh()
        k, d = 3, 5
        centers_true = rng.normal(size=(k, d)).astype(np.float32) * 6
        m = 8 * 60 + 5  # NOT a mesh multiple
        y = rng.integers(0, k, size=m)
        z = centers_true[y] + rng.normal(size=(m, d)).astype(np.float32) * 0.3
        labels, centers = parallel.sharded_kmeans(
            jnp.asarray(z), k, mesh, n_iter=50, n_init=4, init_subsample=256
        )
        assert np.asarray(labels).shape == (m,)
        assert nmi(y, np.asarray(labels)) > 0.99
        # pad rows must not drag centers toward the origin: every center
        # sits near a true blob center
        cdist = ((np.asarray(centers)[:, None] - centers_true[None]) ** 2
                 ).sum(-1).min(1)
        assert (cdist < 1.0).all()
        labels_g, means_g = parallel.sharded_gmm(
            jnp.asarray(z), k, mesh, n_init=4, max_iter=30
        )
        assert np.asarray(labels_g).shape == (m,)
        assert nmi(y, np.asarray(labels_g)) > 0.99

    def test_extreme_mean_offset_kmeans_step(self, rng):
        """Distance computation stays assignment-correct under a common
        offset that dwarfs the spread (review r3: the uncentered matmul
        expansion lost the O(1) inter-cluster differences to f32
        rounding at ||z||^2 ~ 1e8)."""
        mesh = make_data_mesh()
        k, d = 3, 5
        centers_true = (
            rng.normal(size=(k, d)).astype(np.float32) * 2.0 + 1.0e4
        )
        y = rng.integers(0, k, size=8 * 40)
        z = (
            centers_true[y]
            + rng.normal(size=(len(y), d)).astype(np.float32) * 0.1
        ).astype(np.float32)
        labels, _ = parallel.sharded_kmeans_step(
            jnp.asarray(z), jnp.asarray(centers_true), mesh
        )
        d2 = ((z[:, None, :].astype(np.float64)
               - centers_true[None].astype(np.float64)) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(labels), d2.argmin(1))

    def test_sharded_gmm_more_components_than_clusters(self, rng):
        """K exceeding the populated k-means clusters (duplicate/collapsed
        latents) must stay finite: an empty cluster's hard-assignment
        covariance init used to produce -mu.mu^T (negative definite) and
        NaN-poison the whole fit (review r3 second pass)."""
        mesh = make_data_mesh()
        d = 5
        # two true blobs, K=4: at least two k-means clusters end up empty
        centers_true = np.stack([
            np.full(d, -3.0, np.float32), np.full(d, 3.0, np.float32)
        ])
        y = rng.integers(0, 2, size=8 * 40)
        z = (
            centers_true[y]
            + rng.normal(size=(len(y), d)).astype(np.float32) * 0.05
        ).astype(np.float32)
        labels, means = parallel.sharded_gmm(
            jnp.asarray(z), 4, mesh, n_init=4, max_iter=20
        )
        assert np.isfinite(np.asarray(means)).all()
        labels = np.asarray(labels)
        # the two real blobs are separated (some of the 4 components may
        # stay empty, which is fine)
        assert len(set(labels[y == 0]) & set(labels[y == 1])) == 0

    def test_sharded_gmm_small_scale_latents(self, rng):
        """Covariances initialize from the data (hard-assignment M-step),
        not identity — identity covariances flatten responsibilities to
        ~uniform when the latent scale is << 1 and EM collapses to one
        effective component (review r3)."""
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = make_data_mesh()
        k, d = 3, 5
        centers_true = (
            rng.normal(size=(k, d)).astype(np.float32) * 0.02
        )
        y = rng.integers(0, k, size=8 * 80)
        z = (
            centers_true[y]
            + rng.normal(size=(len(y), d)).astype(np.float32) * 0.002
        ).astype(np.float32)
        labels, means = parallel.sharded_gmm(
            jnp.asarray(z), k, mesh, n_init=4, max_iter=30
        )
        assert nmi(y, np.asarray(labels)) > 0.99
        # all K components survived (no collapse to the global mean)
        assert len(np.unique(np.asarray(labels))) == k

    def test_sharded_gmm_recovers_blobs(self, rng):
        from sklearn.metrics import normalized_mutual_info_score as nmi

        mesh = make_data_mesh()
        k, d = 3, 5
        centers_true = rng.normal(size=(k, d)).astype(np.float32) * 6
        y = rng.integers(0, k, size=8 * 80)
        z = centers_true[y] + rng.normal(size=(len(y), d)).astype(np.float32) * 0.3
        labels, means = parallel.sharded_gmm(
            jnp.asarray(z), k, mesh, n_init=4, max_iter=30
        )
        assert means.shape == (k, d)
        assert nmi(y, np.asarray(labels)) > 0.99
        # distributed result matches single-device gmm clustering
        from spectrogram_cube_clustering_tpu import cluster as _cluster

        labels_1, _ = _cluster.gmm(z, k, n_init=4, kmeans_max_iter=100)
        assert nmi(np.asarray(labels_1), np.asarray(labels)) > 0.99


class TestWaveformStreamDataset:
    def test_item_parity_with_spectrogram_windows(self, rng, tmp_path):
        """The host-STFT streaming items, concatenated, equal the ram
        path's spectrogram_windows output (transform=None) — same
        convention singletons, same window ordering — incl. a ragged
        last block."""
        from spectrogram_cube_clustering_tpu.data import WaveformStreamDataset

        wave = rng.normal(size=(20_100,)).astype(np.float32)
        path = str(tmp_path / "w.npy")
        np.save(path, wave)
        ds = WaveformStreamDataset(path, block=13)
        want = np.asarray(
            signal.spectrogram_windows(
                jnp.asarray(wave), transform=None, use_pallas=False
            )
        )
        got = np.concatenate([ds.item(i) for i in range(len(ds))], axis=0)
        assert got.shape == want.shape == (ds.n_windows, 4, 101, 1)
        assert sum(ds.windows_per_item) == ds.n_windows
        assert ds.windows_per_item[-1] == ds.n_windows % 13
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_multichannel_channel_major_order(self, rng, tmp_path):
        from spectrogram_cube_clustering_tpu.data import WaveformStreamDataset

        wave = rng.normal(size=(3, 6_000)).astype(np.float32)
        path = str(tmp_path / "wmc.npy")
        np.save(path, wave)
        ds = WaveformStreamDataset(path, block=7)
        want = np.asarray(
            signal.spectrogram_windows(
                jnp.asarray(wave), transform=None, use_pallas=False
            )
        )
        got = np.concatenate([ds.item(i) for i in range(len(ds))], axis=0)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rejects_bad_shapes(self, tmp_path):
        from spectrogram_cube_clustering_tpu.data import WaveformStreamDataset

        path = str(tmp_path / "bad.npy")
        np.save(path, np.zeros((2, 3, 4), np.float32))
        with pytest.raises(ValueError, match="waveform must be"):
            WaveformStreamDataset(path)
        short = str(tmp_path / "short.npy")
        np.save(short, np.zeros((250,), np.float32))
        with pytest.raises(ValueError, match="window_rows"):
            WaveformStreamDataset(short)


def test_load_data_waveform_multichannel(rng, tmp_path):
    import types

    from spectrogram_cube_clustering_tpu.workflow.data import load_data

    wave = rng.normal(size=(3, 8_000)).astype(np.float32)
    path = str(tmp_path / "wave_mc.npy")
    np.save(path, wave)
    config = types.SimpleNamespace(
        model="DEC", mode="train", fname_dataset=path,
        datafiletype="waveform", nperseg=200, hop=100,
    )
    tra, val = load_data(config)  # DEC train: unsplit
    n_frames = (8_000 - 200) // 100 + 1
    assert tra.shape == (3 * (n_frames // 4), 4, 101, 1)
    assert len(val) == 0
