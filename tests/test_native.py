"""Native chunk-decoder tests: build, correctness, fallback parity."""

import os

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import native
from spectrogram_cube_clustering_tpu.data import zarrlite


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    rng = np.random.default_rng(5)
    data = rng.normal(size=(64, 6, 11)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("nz") / "arr")
    zarrlite.write_array(path, data, chunks=(16, 2, 11))
    return path, data


def test_builds_and_decodes(store):
    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    path, data = store
    arr = zarrlite.open_array(path)
    ids = [(i, j, 0) for i in range(4) for j in range(3)]
    out = native.decode_chunks(
        [arr._chunk_path(i) for i in ids], arr.chunks, arr.dtype,
        arr.compressor_id,
    )
    assert out.shape == (12, 16, 2, 11)
    for n, cid in enumerate(ids):
        np.testing.assert_array_equal(out[n], arr._read_chunk(cid))


def test_missing_chunk_zero_fills(store):
    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    path, _ = store
    arr = zarrlite.open_array(path)
    out = native.decode_chunks(
        [os.path.join(path, "nope.0.0")], arr.chunks, arr.dtype,
        arr.compressor_id,
    )
    np.testing.assert_array_equal(out[0], 0.0)


def test_raw_compressor(tmp_path):
    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    rng = np.random.default_rng(6)
    data = rng.normal(size=(8, 4)).astype(np.float64)
    path = str(tmp_path / "raw")
    zarrlite.write_array(path, data, chunks=(4, 4), compressor=None)
    arr = zarrlite.open_array(path)
    np.testing.assert_array_equal(arr[:, :], data)


def test_prebuilt_lib_without_source_loads(monkeypatch):
    """A shipped .so whose .cpp source is absent (packaged deploys) must
    load as current — the staleness probe raising FileNotFoundError used
    to escape load()'s None-fallback contract and crash cube loads."""
    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_failed", False)
    monkeypatch.setattr(native, "_SRC", native._SRC + ".does-not-exist")
    assert native.load() is not None


def test_getitem_parity_with_python_fallback(store, monkeypatch):
    path, data = store
    arr = zarrlite.open_array(path)
    native_read = arr[3:40, 1:5, :]
    monkeypatch.setattr(native, "_failed", True)
    monkeypatch.setattr(native, "_lib", None)
    python_read = arr[3:40, 1:5, :]
    np.testing.assert_array_equal(native_read, python_read)
    np.testing.assert_array_equal(python_read, data[3:40, 1:5, :])


def test_directory_chunk_path_fails_loudly(store, tmp_path):
    """A directory where a chunk file should be must report a failed
    chunk (IOError), not feed garbage ftell sizes into the decoder — an
    exception escaping a worker thread would terminate the process."""
    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    path, _ = store
    arr = zarrlite.open_array(path)
    bogus = tmp_path / "iamadir.0.0"
    bogus.mkdir()
    with pytest.raises(IOError):
        native.decode_chunks(
            [str(bogus)], arr.chunks, arr.dtype, arr.compressor_id
        )


class TestQuantizeInt8:
    """Native int8 wire quantizer (scc_quantize_int8): bit-exact with the
    numpy reference expression in core.precision.quantize_wire — the two
    encoders must be interchangeable because multi-process feeds may mix
    them (one host with the toolchain, one without)."""

    @staticmethod
    def _numpy_ref(batch):
        red = tuple(range(1, batch.ndim)) if batch.ndim > 1 else (0,)
        absmax = np.max(np.abs(batch), axis=red, keepdims=True)
        scale = np.maximum(
            absmax.astype(np.float32) / 127.0, np.finfo(np.float32).tiny
        )
        q = np.clip(np.rint(batch / scale), -127, 127).astype(np.int8)
        return q, scale

    @pytest.mark.parametrize(
        "shape",
        [
            (64, 4, 101, 1),  # window batches (the serving/stream shape)
            (333, 17),        # latents
            (12345,),         # rank-1 raw waveform segment (fused wire)
            (7, 3),           # tail not a multiple of the unroll width
            (1, 1),
        ],
    )
    def test_bit_exact_with_numpy(self, shape, rng):
        if not native.available():
            pytest.skip("native toolchain unavailable")
        x = rng.standard_normal(shape).astype(np.float32)
        got = native.quantize_int8(np.ascontiguousarray(x))
        assert got is not None
        q_ref, s_ref = self._numpy_ref(x)
        np.testing.assert_array_equal(got[0], q_ref)
        np.testing.assert_array_equal(got[1], s_ref)

    def test_edge_cases_bit_exact(self, rng):
        if not native.available():
            pytest.skip("native toolchain unavailable")
        cases = [
            np.zeros((8, 5), np.float32),          # absmax 0 -> tiny scale
            np.full((4, 3), 1e-38, np.float32),    # subnormal magnitudes
            # exact .5 codes: round-half-to-even must match np.rint
            np.array([[0.5, -0.5, 1.5, -1.5, 2.5, 126.5, -126.5, 127.0]],
                     np.float32),
            # huge dynamic range across samples (per-sample scales)
            (rng.standard_normal((16, 9))
             * 10 ** rng.uniform(-30, 30, (16, 1))).astype(np.float32),
        ]
        for x in cases:
            got = native.quantize_int8(np.ascontiguousarray(x))
            q_ref, s_ref = self._numpy_ref(x)
            np.testing.assert_array_equal(got[0], q_ref)
            np.testing.assert_array_equal(got[1], s_ref)

    def test_quantize_wire_uses_it_transparently(self, rng):
        """The public encoder returns the same dict whichever path ran
        (native or numpy fallback) — pinned by comparing against a run
        with the native library forcibly unavailable."""
        from spectrogram_cube_clustering_tpu.core.precision import (
            quantize_wire,
            wire_dtype,
        )

        x = rng.standard_normal((32, 4, 101, 1)).astype(np.float32)
        w = wire_dtype("int8")
        got = quantize_wire(x, w)
        q_ref, s_ref = self._numpy_ref(x)
        np.testing.assert_array_equal(got["q"], q_ref)
        np.testing.assert_array_equal(got["scale"], s_ref)

    def test_non_f32_and_non_contiguous_fall_back(self, rng):
        """quantize_wire must stay correct for inputs the native path
        declines (f64 batches, strided views)."""
        from spectrogram_cube_clustering_tpu.core.precision import (
            quantize_wire,
            wire_dtype,
        )

        w = wire_dtype("int8")
        x64 = rng.standard_normal((8, 6)).astype(np.float64)
        got = quantize_wire(x64, w)
        q_ref, s_ref = self._numpy_ref(x64)
        np.testing.assert_array_equal(got["q"], q_ref)
        np.testing.assert_array_equal(got["scale"], s_ref)
        assert native.quantize_int8(x64) is None

        xs = rng.standard_normal((16, 12)).astype(np.float32)[:, ::2]
        got = quantize_wire(xs, w)
        q_ref, s_ref = self._numpy_ref(xs)
        np.testing.assert_array_equal(got["q"], q_ref)
        np.testing.assert_array_equal(got["scale"], s_ref)

    def test_missing_symbol_falls_back_to_numpy(self, rng, monkeypatch):
        """A prebuilt .so from before scc_quantize_int8 existed must not
        break the library: quantize_int8 returns None (numpy fallback in
        quantize_wire) while the zarr decoders keep their native path."""
        from spectrogram_cube_clustering_tpu.core.precision import (
            quantize_wire,
            wire_dtype,
        )

        # load() must run BEFORE the monkeypatch: it (re)sets
        # _has_quantize, which would both defeat the patch and leave the
        # flag stuck False for later tests after teardown restored a
        # pre-load snapshot
        if native.load() is None:
            pytest.skip("native toolchain unavailable")
        monkeypatch.setattr(native, "_has_quantize", False)
        x = rng.standard_normal((8, 6)).astype(np.float32)
        assert native.quantize_int8(x) is None
        got = quantize_wire(x, wire_dtype("int8"))
        q_ref, s_ref = self._numpy_ref(x)
        np.testing.assert_array_equal(got["q"], q_ref)
        np.testing.assert_array_equal(got["scale"], s_ref)
