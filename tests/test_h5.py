"""HDF5 catalog tests: SeismicDataset contract, metadata, tools.

The reference stores raw 88x101 spectrograms (row 87 = time vector,
col 0 = freq vector; utils.py:975-981); after crop -> (1, 87, 100).
"""

import json
import os

import h5py
import numpy as np
import pytest

from spectrogram_cube_clustering_tpu.data import h5 as h5mod

M, H_RAW, W_RAW = 12, 88, 101


@pytest.fixture(scope="module")
def catalog(tmp_path_factory, ):
    rng = np.random.default_rng(7)
    path = str(tmp_path_factory.mktemp("h5") / "cat.h5")
    spec = rng.normal(size=(M, H_RAW, W_RAW)).astype(np.float64)
    spec[:, 87, 1:] = np.arange(W_RAW - 1)          # time vector
    spec[:, 0:87, 0] = np.linspace(0, 10, 87)       # freq vector
    trace = rng.normal(size=(M, 200)).astype(np.float64)
    stations = [h5mod.STATION_LIST[i % 4] for i in range(M)]
    meta = [
        json.dumps({"Station": stations[i], "StartTime": f"2015-01-{i+1:02d} 00:00:00.0"})
        for i in range(M)
    ]
    with h5py.File(path, "w") as f:
        g = f.require_group("/4.0")
        g.create_dataset("Spectrogram", data=spec)
        g.create_dataset("Trace", data=trace)
        g.create_dataset("Catalogue", data=np.array(meta, dtype=h5py.string_dtype()))
        g.create_dataset("Scalogram", data=rng.normal(size=(M, 4, 4)))
    return path, spec, stations


class TestSeismicDataset:
    def test_shapes_and_default_pipeline(self, catalog):
        path, spec, _ = catalog
        ds = h5mod.SeismicDataset(path, "h5")
        assert len(ds) == M
        idx, x = ds[3]
        assert idx == 3
        assert x.shape == (1, 87, 100)
        # default pipeline: crop then vec_norm (utils.py:249-257)
        cropped = spec[3, :-1, 1:]
        want = cropped / (np.linalg.norm(cropped.ravel()) + 1e-8)
        np.testing.assert_allclose(x[0], want, rtol=1e-6)

    def test_np_roundtrip(self, catalog, tmp_path):
        path, _, _ = catalog
        dest = str(tmp_path / "cat.npy")
        h5mod.convert_h5_to_np(path, dest)
        ds = h5mod.SeismicDataset(dest, "np", transform=None, crop=False)
        assert len(ds) == M
        _, x0 = ds[0]
        assert x0.shape == (1, 1, 87, 100)  # stored with channel dim already

    def test_query_and_vectors(self, catalog):
        path, spec, _ = catalog
        assert h5mod.query_db_size(path) == (M, H_RAW, W_RAW)
        tvec, fvec = h5mod.get_timefreqvec(path)
        np.testing.assert_allclose(tvec, np.arange(W_RAW - 1))
        assert fvec.shape == (87,)

    def test_metadata(self, catalog):
        path, _, stations = catalog
        meta = h5mod.get_metadata([0, 1], [2, 5], path)
        assert meta[0]["Station"] == stations[2]
        assert meta[1]["Station"] == stations[5]

    def test_station_tables(self):
        assert h5mod.get_station(0) == "DR01"
        assert h5mod.get_station("RS18") == 33
        assert h5mod.get_channel(2) == "HHZ"
        assert h5mod.get_network(0) == "XH"

    def test_read_h5_rows(self, catalog):
        path, spec, _ = catalog
        np.testing.assert_array_equal(h5mod.read_h5(path, 4), spec[4])
        np.testing.assert_array_equal(
            h5mod.read_h5(path, [1, 3]), spec[[1, 3]]
        )

    def test_get_datetime(self):
        # day index into the RIS deployment window (utils.py:916-925)
        assert str(h5mod.get_datetime(0)) == "2014-12-02 00:00:00"
        assert str(h5mod.get_datetime(30)) == "2015-01-01 00:00:00"

    def test_load_images(self, catalog):
        """Reference load_images (utils.py:995-1014): crop, per-sample
        mean/absmax normalization, channel dim, embedded vectors."""
        path, spec, _ = catalog
        x, tvec, fvec = h5mod.load_images(path, [2, 5])
        assert x.shape == (2, 1, 87, 100)
        np.testing.assert_allclose(tvec, np.arange(W_RAW - 1))
        np.testing.assert_allclose(fvec, np.linspace(0, 10, 87))
        want = spec[2, :-1, 1:]
        want = (want - want.mean()) / np.abs(want).max()
        np.testing.assert_allclose(x[0, 0], want, rtol=1e-6)

    def test_normalize_specgram_matches_ops(self, catalog):
        """The host twin must match the on-device ops.normalize family
        (SpecgramNormalizer, utils.py:213-231)."""
        import jax.numpy as jnp

        from spectrogram_cube_clustering_tpu import ops

        rng = np.random.default_rng(3)
        x = rng.normal(size=(5, 4, 101)).astype(np.float32)
        on_device = {
            "sample_normalization": ops.sample_normalization,
            "sample_norm_cent": ops.sample_norm_cent,
            "vec_norm": ops.vec_norm,
        }
        for name, fn in on_device.items():
            host = h5mod.normalize_specgram(x, name)
            dev = np.asarray(fn(jnp.asarray(x[..., None])))[..., 0]
            np.testing.assert_allclose(host, dev, rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(
            h5mod.normalize_specgram(x, None), x
        )
        with pytest.raises(ValueError):
            h5mod.normalize_specgram(x, "bogus")

    def test_load_batch_single_handle_matches_per_item(self, catalog):
        """load_batch's one-handle block read (unsorted + duplicate
        indices) matches the per-event __getitem__ path exactly."""
        path, _, _ = catalog
        ds = h5mod.SeismicDataset(path, "h5")
        idx = [5, 2, 2, 7, 0]
        got = ds.load_batch(idx)
        want = np.stack([ds[i][1] for i in idx], axis=0)
        np.testing.assert_array_equal(got, want)


class TestTraValIndex:
    def test_roundtrip(self, catalog, tmp_path):
        path, _, _ = catalog
        tra, val, pkl = h5mod.save_traval_index(10, path, str(tmp_path), seed=1)
        assert len(tra) == 8 and len(val) == 2
        tra2, val2 = h5mod.load_traval_index(pkl)
        np.testing.assert_array_equal(tra, tra2)
        np.testing.assert_array_equal(val, val2)
        assert 0 not in np.concatenate([tra, val])  # reference draws from [1, M)

    def test_m_equals_db_size_clamps(self, catalog, tmp_path):
        """m >= db size (or a reserve overshoot) used to ask the [1, M)
        population for M samples and crash (review r2)."""
        path, spec, _ = catalog
        m_db = len(spec)
        tra, val, _ = h5mod.save_traval_index(
            m_db + 5, path, str(tmp_path), seed=1
        )
        assert len(tra) + len(val) == m_db - 1
        tra, val, _ = h5mod.save_traval_index(
            m_db - 1, path, str(tmp_path), reserve=0.5, seed=1
        )
        assert len(tra) + len(val) == m_db - 1


class TestExtract:
    def test_station_filter(self, catalog, tmp_path):
        path, _, stations = catalog
        dest = str(tmp_path / "sub.h5")
        keep_station = stations[1]
        kept = h5mod.extract_h5_dataset(path, dest, include=[keep_station])
        # samples 1..M-1 (reference skips index 0) with matching station
        want = sum(1 for i in range(1, M) if stations[i] == keep_station)
        assert kept == want
        with h5py.File(dest, "r") as f:
            assert f["/4.0/Spectrogram"].shape[0] == kept
            meta = json.loads(f["/4.0/Catalogue"][0])
            assert meta["Station"] == keep_station

    def test_time_filter(self, catalog, tmp_path):
        path, _, stations = catalog
        dest = str(tmp_path / "sub2.h5")
        kept = h5mod.extract_h5_dataset(
            path, dest, include=list(set(stations)), after="20150105T000000"
        )
        assert 0 < kept < M - 1

    def test_numpy_integer_station_indices(self, catalog, tmp_path):
        """include=numpy ints must behave like Python ints — they used to
        skip get_station and silently match nothing (review r3)."""
        path, _, stations = catalog
        dest = str(tmp_path / "subnp.h5")
        idx = h5mod.get_station(stations[1])
        kept_np = h5mod.extract_h5_dataset(
            path, dest, include=list(np.array([idx], np.int64))
        )
        dest2 = str(tmp_path / "subpy.h5")
        kept_py = h5mod.extract_h5_dataset(path, dest2, include=[int(idx)])
        assert kept_np == kept_py > 0

    def test_extract_without_trace_dataset(self, catalog, tmp_path):
        """A catalog lacking /4.0/Trace still extracts (the copy loop
        already tolerated it; the scan-length lookup did not, review
        r3)."""
        path, _, stations = catalog
        src = str(tmp_path / "notrace.h5")
        with h5py.File(path, "r") as fs, h5py.File(src, "w") as fd:
            g = fd.require_group("/4.0")
            for name in ("Catalogue", "Spectrogram"):
                g.create_dataset(name, data=fs[f"/4.0/{name}"][:])
        dest = str(tmp_path / "notrace_sub.h5")
        kept = h5mod.extract_h5_dataset(src, dest, include=[stations[1]])
        assert kept > 0
        with h5py.File(dest, "r") as f:
            assert "/4.0/Trace" not in f
            assert f["/4.0/Spectrogram"].shape[0] == kept

    def test_extract_skips_short_aux_dataset(self, catalog, tmp_path):
        """An auxiliary dataset SHORTER than Catalogue (lengths can
        legitimately differ) is omitted whole with a warning instead of
        crashing mid-copy and leaving a torn dest (review r4)."""
        path, _, stations = catalog
        src = str(tmp_path / "shorttrace.h5")
        with h5py.File(path, "r") as fs, h5py.File(src, "w") as fd:
            g = fd.require_group("/4.0")
            for name in ("Catalogue", "Spectrogram"):
                g.create_dataset(name, data=fs[f"/4.0/{name}"][:])
            g.create_dataset("Trace", data=fs["/4.0/Trace"][:2])
        dest = str(tmp_path / "shorttrace_sub.h5")
        with pytest.warns(UserWarning, match="omitting"):
            kept = h5mod.extract_h5_dataset(src, dest, include=list(stations))
        assert kept > 0
        with h5py.File(dest, "r") as f:
            assert "/4.0/Trace" not in f
            assert f["/4.0/Spectrogram"].shape[0] == kept


class TestH5StreamDataset:
    def test_blocks_match_rows(self, catalog):
        path, spec, _ = catalog
        ds = h5mod.H5StreamDataset(path, block=5)
        assert len(ds) == 3  # 12 rows in blocks of 5 -> 5,5,2
        assert ds.windows_per_item == [5, 5, 2]
        assert ds.n_windows == M
        assert ds.window_shape == (87, 100, 1)
        item0 = ds.item(0)
        assert item0.shape == (5, 87, 100, 1)
        # block content == per-row reads, cropped, unnormalized
        want = spec[0:5, :-1, 1:].astype(np.float32)[..., None]
        np.testing.assert_array_equal(item0, want)
        # ragged last block
        last = ds.item(2)
        assert last.shape == (2, 87, 100, 1)
        with pytest.raises(IndexError):
            ds.item(3)

    def test_rejects_bad_block(self, catalog):
        path, _, _ = catalog
        with pytest.raises(ValueError, match="block"):
            h5mod.H5StreamDataset(path, block=0)
