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
