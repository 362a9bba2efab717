"""Serving tests: fixed-shape predictors, padding, checkpoint loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu import serve
from spectrogram_cube_clustering_tpu.train.checkpoint import save


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    x, _ = scc.data.synthetic_windows(64, n_classes=3, seed=1)
    xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    dec = scc.models.DEC(n_clusters=3)
    params = dec.init(jax.random.key(0), jnp.asarray(xn[:2]))["params"]
    path = str(root / "DEC_Params_Final")
    save(path, params)
    aec_params = {"encoder": params["encoder"], "decoder": params["decoder"]}
    aec_path = str(root / "AEC_Params_Final")
    save(aec_path, aec_params)
    return path, aec_path, x, xn, params


class TestDECPredictor:
    def test_outputs_match_direct_apply(self, trained):
        path, _, x, xn, params = trained
        pred = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=128)
        pred.warmup()
        out = pred(x)  # raw windows; predictor normalizes on device
        assert out["q"].shape == (64, 3)
        assert out["labels"].shape == (64,)
        assert out["z"].shape == (64, 9)
        model = scc.models.DEC(n_clusters=3)
        q, _, z = model.apply({"params": params}, jnp.asarray(xn))
        np.testing.assert_allclose(out["q"], np.asarray(q), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(out["z"], np.asarray(z), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(out["q"].sum(1), 1.0, atol=1e-5)

    def test_padding_independence(self, trained):
        path, _, x, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=128)
        single = pred(x[:1])
        full = pred(x)
        np.testing.assert_allclose(single["z"][0], full["z"][0], rtol=1e-5)

    def test_oversized_request_chunks(self, trained):
        """Requests above max_batch run as multiple fixed-shape chunks
        with identical results — never a rejection or recompile."""
        path, _, x, _, _ = trained
        small = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=16)
        big = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=128)
        out = small(x)  # 64 windows through a 16-batch predictor
        ref = big(x)
        np.testing.assert_allclose(out["z"], ref["z"], rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(out["labels"], ref["labels"])

    def test_empty_request(self, trained):
        """A zero-row request returns correctly-shaped empty outputs."""
        path, _, x, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=16)
        out = pred(np.zeros((0, 4, 101, 1), np.float32))
        assert out["q"].shape == (0, 3)
        assert out["labels"].shape == (0,)
        assert out["z"].shape == (0, 9)

    def test_rejects_bucket_above_max_batch(self, trained):
        path, _, _, _, params = trained
        with pytest.raises(ValueError, match="exceeds max_batch"):
            serve.DECPredictor(params, n_clusters=3, max_batch=16,
                               buckets=[64])

    def test_bucket_ladder(self, trained):
        """buckets=True compiles a power-of-two ladder; a 3-window request
        runs the 4-bucket, matching the full-batch result."""
        path, _, x, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(path, n_clusters=3, max_batch=64)
        pred_b = serve.DECPredictor(
            pred.params, n_clusters=3, max_batch=64, buckets=True
        )
        assert pred_b.sizes == (1, 2, 4, 8, 16, 32, 64)
        out = pred_b(x[:3])
        ref = pred(x)
        np.testing.assert_allclose(out["z"], ref["z"][:3], rtol=1e-5, atol=1e-7)

    def test_buckets_through_from_checkpoint(self, trained):
        """from_checkpoint threads `buckets` (the scc-serve --buckets
        path) instead of requiring a second manual construction."""
        path, aec_path, x, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=64, buckets=True
        )
        assert pred.sizes == (1, 2, 4, 8, 16, 32, 64)
        enc = serve.AECEncoder.from_checkpoint(
            aec_path, max_batch=64, buckets=True
        )
        assert enc.sizes == (1, 2, 4, 8, 16, 32, 64)
        enc.warmup()  # AECEncoder has the same warmup contract
        assert enc(x[:3]).shape == (3, 9)


class TestMeshServing:
    """Data-parallel serving over a device mesh (the virtual 8-CPU mesh
    here): params replicate, the request batch shards, outputs match the
    single-device predictor exactly."""

    def test_mesh_predictor_matches_single_device(self, trained):
        path, _, x, _, _ = trained
        mesh = scc.core.make_data_mesh()
        assert mesh.size == 8
        pred_m = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128, mesh=mesh
        )
        pred_m.warmup()
        pred_1 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128
        )
        for n in (64, 8, 5, 1):  # incl. sizes that pad across the mesh
            out_m, out_1 = pred_m(x[:n]), pred_1(x[:n])
            np.testing.assert_allclose(
                out_m["z"], out_1["z"], rtol=1e-5, atol=1e-7
            )
            np.testing.assert_array_equal(out_m["labels"], out_1["labels"])
        # outputs really were computed sharded: the request lands on all
        # 8 devices
        xb = serve._pad_to(x[:64].astype(np.float32), 64)[0]
        arr = pred_m._put(xb)
        assert len(arr.sharding.device_set) == 8

    def test_mesh_bucket_ladder_is_divisible(self, trained):
        path, _, x, _, _ = trained
        mesh = scc.core.make_data_mesh()
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=64, buckets=True, mesh=mesh
        )
        assert pred.sizes == (8, 16, 32, 64)
        assert all(s % mesh.size == 0 for s in pred.sizes)
        # explicit buckets round up to mesh multiples
        pred2 = serve.DECPredictor(
            pred.params, n_clusters=3, max_batch=64, buckets=[3, 20],
            mesh=mesh,
        )
        assert pred2.sizes == (8, 24, 64)
        with pytest.raises(ValueError, match="multiple of the mesh"):
            serve.DECPredictor(
                pred.params, n_clusters=3, max_batch=12, mesh=mesh
            )

    def test_mesh_encoder_and_empty_request(self, trained):
        _, aec_path, x, xn, params = trained
        mesh = scc.core.make_data_mesh()
        enc = serve.AECEncoder.from_checkpoint(
            aec_path, max_batch=64, mesh=mesh
        )
        z = enc(x[:10])
        model = scc.models.AEC()
        want = model.apply(
            {"params": params}, jnp.asarray(xn[:10]), method="encode"
        )
        np.testing.assert_allclose(z, np.asarray(want), rtol=2e-4, atol=1e-6)
        out = enc(np.zeros((0, 4, 101, 1), np.float32))
        assert out.shape == (0, 9)


class TestAECEncoder:
    def test_latents(self, trained):
        _, aec_path, x, xn, params = trained
        enc = serve.AECEncoder.from_checkpoint(aec_path, max_batch=128)
        z = enc(x)
        assert z.shape == (64, 9)
        model = scc.models.AEC()
        want = model.apply(
            {"params": {"encoder": params["encoder"],
                        "decoder": params["decoder"]}},
            jnp.asarray(xn), method="encode",
        )
        np.testing.assert_allclose(z, np.asarray(want), rtol=2e-4, atol=1e-6)


class TestTransferDtype:
    def test_bf16_transfer_matches_f32(self, trained):
        """Half-width host->device transfer (`transfer_dtype`): labels
        identical, q/z within input-quantization tolerance of the f32
        path (serving is wire-bound, RESULTS.md 'Serving latency')."""
        path, _, x, _, _ = trained
        f32 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128
        )
        bf16 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128, transfer_dtype="bfloat16"
        )
        a, b = f32(x), bf16(x)
        assert np.array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["q"], b["q"], atol=5e-3)
        np.testing.assert_allclose(a["z"], b["z"], rtol=0.05, atol=5e-2)

    def test_f16_encoder_matches_f32(self, trained):
        _, aec_path, x, _, _ = trained
        f32 = serve.AECEncoder.from_checkpoint(aec_path, max_batch=128)
        f16 = serve.AECEncoder.from_checkpoint(
            aec_path, max_batch=128, transfer_dtype="float16"
        )
        np.testing.assert_allclose(f32(x), f16(x), rtol=0.02, atol=2e-2)

    def test_int8_wire_matches_f32(self, trained):
        """Quarter-width int8 wire (per-sample symmetric scales,
        core.precision.quantize_wire): q within input-quantization
        tolerance of the f32 path, near-total label agreement (the
        1/127-of-absmax step can flip genuinely ambiguous boundary
        windows under an untrained-adjacent encoder). On-chip evidence:
        benchmarks/RESULTS.md "Serving wire A/B" (r5: label agreement
        1.0000 on a trained-model A/B, int8 2.19x f32 sustained) and
        "int8 wire convergence" (workflow-scale streaming pretrain
        parity, benchmarks/int8_stream_convergence_tpu.py)."""
        path, _, x, _, _ = trained
        f32 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128
        )
        i8 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=128, transfer_dtype="int8"
        )
        a, b = f32(x), i8(x)
        assert (a["labels"] == b["labels"]).mean() >= 0.95
        np.testing.assert_allclose(a["q"], b["q"], atol=3e-2)

    def test_int8_encoder_matches_f32(self, trained):
        _, aec_path, x, _, _ = trained
        f32 = serve.AECEncoder.from_checkpoint(aec_path, max_batch=128)
        i8 = serve.AECEncoder.from_checkpoint(
            aec_path, max_batch=128, transfer_dtype="int8"
        )
        i8.warmup()
        np.testing.assert_allclose(f32(x), i8(x), rtol=0.05, atol=5e-2)

    def test_unknown_transfer_dtype_rejected(self, trained):
        path, _, _, _, _ = trained
        with pytest.raises(ValueError, match="transfer_dtype"):
            serve.DECPredictor.from_checkpoint(
                path, n_clusters=3, transfer_dtype="int4"
            )


def test_packed_predictor_from_checkpoint(tmp_path):
    """arch='packed' serves the MXU-packed DEC (models/packed.py) through
    the same fixed-shape bucket ladder."""
    x, _ = scc.data.synthetic_windows(32, n_classes=3, seed=2)
    xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    dec = scc.models.PackedDEC(n_clusters=3)
    params = dec.init(jax.random.key(0), jnp.asarray(xn[:2]))["params"]
    path = str(tmp_path / "DEC_Params_Final")
    save(path, params)

    pred = serve.DECPredictor.from_checkpoint(
        path, n_clusters=3, max_batch=16, arch="packed"
    )
    out = pred(x[:5])
    assert out["q"].shape == (5, 3)
    q_direct, _, _ = dec.apply({"params": params},
                               jnp.asarray(xn[:5]))
    np.testing.assert_allclose(out["q"], np.asarray(q_direct), atol=1e-5)

    # fused waveform route composes with the packed arch: the fused
    # program wraps predictor._fn, so arch must be transparent to it
    wf = serve.WaveformFrontend(pred, chunk_samples=1)
    assert wf.fused
    wave = np.random.default_rng(5).normal(size=2_000).astype(np.float32)
    fused = wf(wave)
    two_pass = pred(wf.windows(wave))
    np.testing.assert_array_equal(fused["labels"], two_pass["labels"])
    np.testing.assert_allclose(
        fused["q"], two_pass["q"], rtol=1e-5, atol=1e-7
    )


def test_h5_geometry_predictor_from_checkpoint(tmp_path):
    """DEC checkpoints trained on the H5 event-catalog geometry (87, 100)
    serve through `input_hw=` (review r3: the default template used to
    hard-code (4, 101) and fail the restore)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 87, 100, 1)).astype(np.float32)
    dec = scc.models.DEC(n_clusters=3, input_hw=(87, 100))
    params = dec.init(jax.random.key(0), jnp.asarray(x[:2]))["params"]
    path = str(tmp_path / "DEC_Params_Final")
    save(path, params)

    pred = serve.DECPredictor.from_checkpoint(
        path, n_clusters=3, max_batch=8, input_hw=(87, 100)
    )
    out = pred(x[:3])
    assert out["q"].shape == (3, 3)
    assert np.isfinite(out["q"]).all()


class TestServeArchVariants:
    """Review r3.2: checkpoints trained with arch='packed' or
    attention_faithful=False were unservable (shape-lenient restore +
    opaque jit error); serving now exposes both knobs and fails loudly
    on mismatch."""

    def test_packed_aec_encoder_served(self, tmp_path):
        x, _ = scc.data.synthetic_windows(16, n_classes=3, seed=2)
        xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.PackedAEC()
        params = model.init(jax.random.key(0), jnp.asarray(xn[:2]))["params"]
        path = str(tmp_path / "PackedAEC_Params_Final")
        save(path, params)
        enc = serve.AECEncoder.from_checkpoint(
            path, max_batch=16, arch="packed"
        )
        z = enc(x)
        want = model.apply({"params": params}, jnp.asarray(xn),
                           method="encode")
        np.testing.assert_allclose(z, np.asarray(want), rtol=2e-4, atol=1e-6)

    def test_unfaithful_attention_checkpoint_served(self, tmp_path):
        x, _ = scc.data.synthetic_windows(16, n_classes=3, seed=3)
        xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.DEC(n_clusters=3, attention_faithful=False)
        params = model.init(jax.random.key(0), jnp.asarray(xn[:2]))["params"]
        path = str(tmp_path / "DEC_Params_Final")
        save(path, params)
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, attention_faithful=False
        )
        out = pred(x)
        q, _, z = model.apply({"params": params}, jnp.asarray(xn))
        np.testing.assert_allclose(out["q"], np.asarray(q), rtol=2e-4,
                                   atol=1e-6)

    def test_arch_mismatch_fails_loudly(self, trained, tmp_path):
        # disjoint tree structure: orbax itself raises (ValueError
        # listing the mismatched modules) before the shape check runs
        _, aec_path, _, _, _ = trained
        with pytest.raises(ValueError):
            serve.AECEncoder.from_checkpoint(
                aec_path, max_batch=16, arch="packed"
            )

    def test_faithful_mismatch_fails_loudly(self, tmp_path):
        # same tree structure, different head width: orbax restores
        # leniently, so the explicit shape check must catch it
        x, _ = scc.data.synthetic_windows(4, n_classes=2, seed=5)
        xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.DEC(n_clusters=2, attention_faithful=False)
        params = model.init(jax.random.key(0), jnp.asarray(xn))["params"]
        path = str(tmp_path / "DEC_Params_Final")
        save(path, params)
        with pytest.raises(ValueError, match="at odds with the configured"):
            serve.DECPredictor.from_checkpoint(
                path, n_clusters=2, max_batch=4, attention_faithful=True
            )


class TestWaveformFrontend:
    def test_windows_match_spectrogram_windows(self, trained):
        """Chunked on-device windowing == one-shot spectrogram_windows
        (transform=None), incl. a ragged tail chunk and multichannel
        channel-major order."""
        from spectrogram_cube_clustering_tpu.signal.stft import (
            spectrogram_windows,
        )

        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        # tiny chunk (rounded up to the 400-sample window span) forces
        # many chunks + a padded tail
        wf = serve.WaveformFrontend(pred, chunk_samples=1)
        rng = np.random.default_rng(3)
        wave = rng.normal(size=(5, 2_345)).astype(np.float32)
        want = np.asarray(
            spectrogram_windows(jnp.asarray(wave), transform=None)
        )
        got = wf.windows(wave)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_call_routes_through_predictor(self, trained):
        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        wf = serve.WaveformFrontend(pred)
        wf.warmup()
        wave = np.random.default_rng(0).normal(size=(2, 3_000)).astype(
            np.float32
        )
        out = wf(wave)
        n = wf.n_windows(3_000)
        assert out["labels"].shape == (2 * n,)
        assert out["q"].shape == (2 * n, 3)
        np.testing.assert_array_equal(
            out["windows_per_channel"], [n, n]
        )
        # parity with the window-payload path
        direct = pred(wf.windows(wave))
        np.testing.assert_array_equal(out["labels"], direct["labels"])

    def test_geometry_mismatch_fails_loudly(self, trained):
        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        with pytest.raises(ValueError, match="input_hw"):
            serve.WaveformFrontend(pred, nperseg=128, hop=64)
        with pytest.raises(ValueError, match="nperseg"):
            serve.WaveformFrontend(pred, nperseg=250, hop=100)

    def test_too_short_waveform_fails_loudly(self, trained):
        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        wf = serve.WaveformFrontend(pred)
        with pytest.raises(ValueError, match="no complete"):
            wf.windows(np.zeros(450, np.float32))  # < 500-sample span

    def test_chunk_ladder_rung_selection(self, trained):
        """Short requests run through the smallest covering rung (no
        full-chunk zero-pad over the wire) with outputs identical to a
        frontend whose chunk is exactly that small; oversized requests
        keep the full rung (multi-chunk)."""
        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=64
        )
        wf = serve.WaveformFrontend(pred, chunk_samples=400 * 64)
        assert wf._rung_wins == [1, 8, 64]
        assert wf._pick_rung(1) == 1
        assert wf._pick_rung(7) == 8
        assert wf._pick_rung(64) == 64
        assert wf._pick_rung(200) == 64  # multi-chunk keeps the full rung
        segs = list(wf._iter_segments(np.zeros((1, 3_000), np.float32), 7))
        assert len(segs) == 1
        assert segs[0][0].shape[0] == wf._rung_seg_len(8)
        # fused frontends cap the top rung at the predictor's compiled-
        # shape contract (max_batch), splitting longer requests into
        # more chunks instead of over-batching the model pass
        small = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        wf_cap = serve.WaveformFrontend(small, chunk_samples=400 * 64)
        assert wf_cap.fused and wf_cap._rung_wins[-1] == 16
        # output parity with a frontend built at the small chunk size
        wf_small = serve.WaveformFrontend(pred, chunk_samples=400 * 8)
        wave = np.random.default_rng(7).normal(size=(2, 3_000)).astype(
            np.float32
        )
        np.testing.assert_allclose(
            wf.windows(wave), wf_small.windows(wave), atol=1e-5
        )
        a, b = wf(wave), wf_small(wave)
        np.testing.assert_allclose(a["q"], b["q"], rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(a["labels"]), np.asarray(b["labels"])
        )

    def test_ladder_geometry_fuzz(self, trained):
        """Random request lengths x chunk sizes x channel counts: the
        laddered, chunked, zero-padded windows() always equals one-shot
        spectrogram_windows (rung selection, multi-chunk splits, ragged
        tails, per-channel ordering)."""
        from spectrogram_cube_clustering_tpu.signal.stft import (
            spectrogram_windows,
        )

        path, _, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        rng = np.random.default_rng(2026)
        span = 4 * 100  # window span at the default nperseg=200/hop=100
        for _ in range(12):
            chunk = int(rng.integers(1, 12)) * span
            wf = serve.WaveformFrontend(pred, chunk_samples=chunk)
            channels = int(rng.integers(1, 4))
            t = int(rng.integers(500, 12_000))
            wave = rng.normal(size=(channels, t)).astype(np.float32)
            if wf.n_windows(t) < 1:
                with pytest.raises(ValueError, match="no complete"):
                    wf.windows(wave)
                continue
            want = np.asarray(
                spectrogram_windows(jnp.asarray(wave), transform=None)
            )
            got = wf.windows(wave)
            assert got.shape == want.shape, (chunk, channels, t)
            np.testing.assert_allclose(
                got, want, atol=1e-4, err_msg=f"{(chunk, channels, t)}"
            )

    def test_fused_path_matches_two_pass(self, trained):
        """fuse=auto (on for bare single-device predictors) computes
        STFT+normalize+model in one program; outputs must match the
        two-pass windows()+predictor route."""
        path, aec_path, _, _, _ = trained
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        wave = np.random.default_rng(2).normal(size=(2, 3_400)).astype(
            np.float32
        )
        wf_fused = serve.WaveformFrontend(pred, chunk_samples=1)
        assert wf_fused.fused
        wf_two = serve.WaveformFrontend(pred, chunk_samples=1, fuse=False)
        a, b = wf_fused(wave), wf_two(wave)
        np.testing.assert_array_equal(
            a["windows_per_channel"], b["windows_per_channel"]
        )
        np.testing.assert_allclose(a["q"], b["q"], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(a["z"], b["z"], rtol=1e-5, atol=1e-6)
        # AEC encoder: fused path returns {"z"} too
        enc = serve.AECEncoder.from_checkpoint(aec_path, max_batch=16)
        wf_enc = serve.WaveformFrontend(enc, chunk_samples=1)
        assert wf_enc.fused
        z = wf_enc(wave)["z"]
        np.testing.assert_allclose(
            z, enc(wf_enc.windows(wave)), rtol=1e-5, atol=1e-6
        )

    def test_fused_bf16_wire_matches_f32(self, trained):
        """The fused route honors the predictor's transfer_dtype: raw
        samples cross host->device at half width (same byte count as the
        window stack they become), f32 restored before the STFT — labels
        identical, q within input-quantization tolerance, mirroring the
        window-path contract."""
        path, _, _, _, _ = trained
        f32 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        bf16 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, transfer_dtype="bfloat16"
        )
        wf32 = serve.WaveformFrontend(f32, chunk_samples=1)
        wfbf = serve.WaveformFrontend(bf16, chunk_samples=1)
        assert wf32.fused and wfbf.fused
        assert wfbf._fused_wire is not None
        wave = np.random.default_rng(9).normal(size=(2, 2_000)).astype(
            np.float32
        )
        a, b = wf32(wave), wfbf(wave)
        assert np.array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["q"], b["q"], atol=5e-3)
        np.testing.assert_array_equal(
            a["windows_per_channel"], b["windows_per_channel"]
        )

    def test_fused_int8_wire_matches_f32(self, trained):
        """int8 on the fused waveform wire: one symmetric scale per raw
        segment ({'q','scale'} pytree through the jitted fused program),
        f32 restored on device BEFORE the STFT."""
        path, _, _, _, _ = trained
        f32 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16
        )
        i8 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, transfer_dtype="int8"
        )
        wf32 = serve.WaveformFrontend(f32, chunk_samples=1)
        wfi8 = serve.WaveformFrontend(i8, chunk_samples=1)
        assert wf32.fused and wfi8.fused
        wfi8.warmup()  # the int8 pytree path through every rung compile
        wave = np.random.default_rng(9).normal(size=(2, 2_000)).astype(
            np.float32
        )
        a, b = wf32(wave), wfi8(wave)
        assert (a["labels"] == b["labels"]).mean() >= 0.95
        np.testing.assert_allclose(a["q"], b["q"], atol=3e-2)
        np.testing.assert_array_equal(
            a["windows_per_channel"], b["windows_per_channel"]
        )

    def test_mesh_predictor_falls_back_to_two_pass(self, trained):
        path, _, _, _, _ = trained
        from spectrogram_cube_clustering_tpu.core import make_data_mesh

        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, mesh=make_data_mesh()
        )
        wf = serve.WaveformFrontend(pred)
        assert not wf.fused
        wave = np.random.default_rng(4).normal(size=(1_000,)).astype(
            np.float32
        )
        out = wf(wave)
        assert out["labels"].shape == (wf.n_windows(1_000),)

    def test_mesh_fused_matches_two_pass(self, trained):
        """Explicit fuse=True on a mesh predictor runs the SPMD
        composition — time-sharded halo STFT feeding the batch-sharded
        model pass in one program — and must match the two-pass mesh
        route (host windows -> sharded predictor) on the virtual
        8-device mesh, incl. multi-chunk multichannel requests."""
        path, _, _, _, _ = trained
        from spectrogram_cube_clustering_tpu.core import make_data_mesh

        mesh = make_data_mesh()
        pred = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, mesh=mesh
        )
        fused = serve.WaveformFrontend(pred, chunk_samples=1, fuse=True)
        assert fused.fused
        two_pass = serve.WaveformFrontend(pred, chunk_samples=1)
        wave = np.random.default_rng(6).normal(size=(2, 2_345)).astype(
            np.float32
        )
        a = fused(wave)
        b = two_pass(wave)
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["q"], b["q"], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(a["z"], b["z"], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            a["windows_per_channel"], b["windows_per_channel"]
        )
        # int8 on the SPMD-fused wire: the {'q','scale'} pytree flows
        # through the time-sharded program, dequantized before the pad
        i8 = serve.DECPredictor.from_checkpoint(
            path, n_clusters=3, max_batch=16, mesh=mesh,
            transfer_dtype="int8",
        )
        fused_i8 = serve.WaveformFrontend(i8, chunk_samples=1, fuse=True)
        c = fused_i8(wave)
        assert (a["labels"] == c["labels"]).mean() >= 0.95
        np.testing.assert_allclose(a["q"], c["q"], atol=3e-2)
