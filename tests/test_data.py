"""Data-layer tests: zarrlite store round-trips and cube window math.

Window-math parity target: Cluster/ZarrDataLoader.py:42-85 (chunk 5758,
4-row windows, channel `idx*chunk // usable * 5 + 1600`, usable time
= shape[0] // 11 * 2).
"""

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu.data import (
    CubeSpec,
    ZarrCubeDataset,
    make_synthetic_cube,
    train_val_split,
    zarrlite,
)


class TestZarrlite:
    @pytest.mark.parametrize("compressor", [None, "zlib"])
    def test_roundtrip_3d(self, tmp_path, rng, compressor):
        data = rng.normal(size=(37, 11, 13)).astype(np.float32)
        path = str(tmp_path / "a")
        zarrlite.write_array(path, data, chunks=(8, 4, 13), compressor=compressor)
        arr = zarrlite.open_array(path)
        assert arr.shape == data.shape and arr.dtype == data.dtype
        np.testing.assert_array_equal(arr[:, :, :], data)
        # partial reads crossing chunk boundaries
        np.testing.assert_array_equal(arr[5:21, 3, :], data[5:21, 3, :])
        np.testing.assert_array_equal(arr[36, 10, 2:9], data[36, 10, 2:9])
        np.testing.assert_array_equal(arr[0:8, 0:4, :], data[0:8, 0:4, :])

    def test_chunk_cache_hits_and_correctness(self, tmp_path, rng):
        """Repeated reads of the same chunk decode once (LRU cache) and
        return identical data; eviction keeps the cache bounded."""
        data = rng.normal(size=(16, 8)).astype(np.float32)
        path = str(tmp_path / "c")
        zarrlite.write_array(path, data, chunks=(4, 8), compressor="zlib")
        arr = zarrlite.open_array(path)
        decodes = []
        orig = arr._decode_chunk
        arr._decode_chunk = lambda idx: (decodes.append(tuple(idx)), orig(idx))[1]
        np.testing.assert_array_equal(arr[0:4, :], data[0:4, :])
        np.testing.assert_array_equal(arr[1, :], data[1, :])
        np.testing.assert_array_equal(arr[2:4, 3], data[2:4, 3])
        assert decodes == [(0, 0)]  # one decode, two cache hits
        # touch all 4 chunks then the first again: capacity 4 -> still cached
        np.testing.assert_array_equal(arr[:, :], data)
        n = len(decodes)
        np.testing.assert_array_equal(arr[0:4, :], data[0:4, :])
        assert len(decodes) == n
        # shrink capacity to 1: alternating chunks re-decode every time
        arr2 = zarrlite.ZarrArray(path, cache_chunks=1)
        decodes2 = []
        orig2 = arr2._decode_chunk
        arr2._decode_chunk = lambda idx: (decodes2.append(tuple(idx)), orig2(idx))[1]
        arr2[0:4, :], arr2[4:8, :], arr2[0:4, :]
        assert decodes2 == [(0, 0), (1, 0), (0, 0)]

    def test_negative_and_int_indexing(self, tmp_path, rng):
        data = rng.integers(0, 100, size=(10, 6)).astype(np.int64)
        path = str(tmp_path / "b")
        zarrlite.write_array(path, data, chunks=(4, 4))
        arr = zarrlite.open_array(path)
        np.testing.assert_array_equal(arr[-1, :], data[-1, :])
        assert arr[3, 5] == data[3, 5]

    def test_out_of_range_index_raises(self, tmp_path, rng):
        """OOB integer indices used to map to nonexistent chunk files and
        silently return fill_value (review r2)."""
        data = rng.integers(0, 100, size=(10, 6)).astype(np.int64)
        path = str(tmp_path / "oob")
        zarrlite.write_array(path, data, chunks=(4, 4))
        arr = zarrlite.open_array(path)
        with pytest.raises(IndexError, match="out of bounds"):
            arr[10, 0]
        with pytest.raises(IndexError, match="out of bounds"):
            arr[-11, 0]
        with pytest.raises(IndexError, match="out of bounds"):
            arr[0, 6]

    def test_group(self, tmp_path, rng):
        data = rng.normal(size=(6, 5)).astype(np.float64)
        path = str(tmp_path / "g")
        zarrlite.write_group(path, {"cube": data}, chunks=(3, 5))
        grp = zarrlite.open_group(path)
        assert grp.keys() == ["cube"]
        np.testing.assert_array_equal(grp["cube"][:, :], data)

    def test_cube_dataset_bad_array_name(self, tmp_path, rng):
        """A wrong array_name inside a valid group reports the name, not
        a misleading '<group>/.zarray not found' from the bare-array
        fallback; an arrayless group gets a clear error too (review r3)."""
        data = rng.normal(size=(352, 8, 5)).astype(np.float32)
        path = str(tmp_path / "gname")
        zarrlite.write_group(path, {"cube": data}, chunks=(16, 8, 5))
        with pytest.raises(FileNotFoundError, match="'cubee' not found"):
            ZarrCubeDataset(path, SPEC, array_name="cubee")
        import os

        empty = str(tmp_path / "gempty")
        os.makedirs(empty)
        with open(os.path.join(empty, ".zgroup"), "w") as f:
            f.write('{"zarr_format": 2}')
        with pytest.raises(FileNotFoundError, match="no arrays"):
            ZarrCubeDataset(empty, SPEC)

    def test_write_array_rejects_unknown_compressor(self, tmp_path, rng):
        """'gzip' (which the READ path accepts) or a typo must raise, not
        silently write an uncompressed store (review r4)."""
        data = rng.normal(size=(8, 4)).astype(np.float32)
        with pytest.raises(ValueError, match="unknown compressor"):
            zarrlite.write_array(
                str(tmp_path / "g"), data, chunks=(4, 4), compressor="gzip"
            )

    def test_missing_chunk_fill_value(self, tmp_path, rng):
        data = rng.normal(size=(8, 4)).astype(np.float32)
        path = str(tmp_path / "m")
        zarrlite.write_array(path, data, chunks=(4, 4), compressor=None)
        import os

        os.remove(os.path.join(path, "1.0"))
        arr = zarrlite.open_array(path)
        np.testing.assert_array_equal(arr[0:4, :], data[0:4, :])
        np.testing.assert_array_equal(arr[4:8, :], np.zeros((4, 4), np.float32))

    def test_null_fill_value_reads_as_zero(self, tmp_path, rng):
        """'fill_value': null stores must read missing chunks as 0 on the
        single-chunk Python path too — np.full(..., None) made NaN for
        floats, raised for int dtypes, and disagreed with the native
        batch decoder's zero-fill (review r3)."""
        import json
        import os

        data = rng.integers(0, 100, size=(8, 4)).astype(np.int64)
        path = str(tmp_path / "nullfill")
        zarrlite.write_array(path, data, chunks=(4, 4), compressor=None)
        meta_path = os.path.join(path, ".zarray")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["fill_value"] = None
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        os.remove(os.path.join(path, "1.0"))
        arr = zarrlite.open_array(path)
        # single-chunk read (Python decode path)
        np.testing.assert_array_equal(arr[4:8, :], np.zeros((4, 4), np.int64))
        # multi-chunk read (native batch path when available)
        np.testing.assert_array_equal(arr[:, :][4:8], np.zeros((4, 4), np.int64))
        np.testing.assert_array_equal(arr[:, :][:4], data[:4])

    def test_slice_fuzz_matches_numpy(self, tmp_path, rng):
        """Seeded fuzz of the chunk-grid indexing math: random shapes,
        chunk grids, and mixed int/slice indices must match numpy
        exactly (the zarr reader is the data boundary — an off-by-one
        here silently corrupts every window downstream)."""
        for trial in range(25):
            ndim = int(rng.integers(1, 4))
            shape = tuple(int(rng.integers(1, 40)) for _ in range(ndim))
            chunks = tuple(
                int(rng.integers(1, s + 3)) for s in shape
            )
            data = rng.normal(size=shape).astype(np.float32)
            path = str(tmp_path / f"fz{trial}")
            zarrlite.write_array(
                path, data, chunks=chunks,
                compressor=["zlib", None][trial % 2],
            )
            arr = zarrlite.open_array(path)
            for _ in range(8):
                idx = []
                for d, s in enumerate(shape):
                    if rng.random() < 0.4:
                        idx.append(int(rng.integers(-s, s)))
                    else:
                        lo = int(rng.integers(0, s + 1))
                        hi = int(rng.integers(lo, s + 1))
                        idx.append(slice(lo, hi))
                idx = tuple(idx)
                np.testing.assert_array_equal(
                    arr[idx], data[idx], err_msg=f"{shape} {chunks} {idx}"
                )

    def test_empty_slice_reads_nothing(self, tmp_path, rng):
        """A zero-length slice — including one at the array end — returns
        an empty array without touching any chunk (the old chunk-grid
        formula forced a read of a nonexistent chunk past the grid,
        review r3)."""
        data = rng.normal(size=(8, 4)).astype(np.float32)
        path = str(tmp_path / "empty")
        zarrlite.write_array(path, data, chunks=(4, 4), compressor=None)
        arr = zarrlite.open_array(path)
        reads = []
        orig = arr._read_chunks_batch
        arr._read_chunks_batch = lambda ids: (reads.extend(ids), orig(ids))[1]
        assert arr[8:8, :].shape == (0, 4)
        assert arr[3:3, 1:2].shape == (0, 1)
        assert reads == []


# Small geometry so tests stay fast: 2 usable chunks of 16 rows, stride-2
# channels from 3.
SPEC = CubeSpec(
    chunk_size=16, window_rows=4, channel_start=3, channel_stride=2,
    time_num=2, time_den=11,
)


def reference_window_math(shape, spec):
    """Literal transcription of the reference indexing formulas
    (ZarrDataLoader.py:56,63-66) for cross-checking CubeSpec."""
    usable = shape[0] // spec.time_den * spec.time_num
    n = usable // spec.chunk_size * (
        (shape[1] - spec.channel_start) // spec.channel_stride
    )
    locs = []
    for idx in range(n):
        start = (idx * spec.chunk_size) % usable
        ch = (idx * spec.chunk_size) // usable * spec.channel_stride + spec.channel_start
        locs.append((start, ch))
    return n, locs


class TestCubeDataset:
    def test_window_math_matches_reference_formulas(self):
        shape = (16 * 11, 9, 7)  # usable = 32 rows = 2 chunks; 3 channels
        n, locs = reference_window_math(shape, SPEC)
        assert SPEC.num_items(shape) == n == 6
        for i in range(n):
            assert SPEC.item_location(i, shape) == locs[i]

    def test_item_extraction(self, tmp_path, rng):
        shape = (16 * 11, 9, 7)
        cube = rng.normal(size=shape).astype(np.float32)
        path = str(tmp_path / "cube")
        zarrlite.write_group(path, {"cube": cube}, chunks=(16, 1, 7))
        ds = ZarrCubeDataset(path, spec=SPEC)
        assert len(ds) == 6
        assert ds.windows_per_item == 4  # 16 // 4
        item = ds.item(5)
        assert item.shape == (4, 4, 7, 1)
        start, ch = SPEC.item_location(5, shape)
        expected = cube[start : start + 16, ch, :].reshape(4, 4, 7)[..., None]
        np.testing.assert_allclose(item, expected)
        with pytest.raises(IndexError):
            ds.item(6)

    def test_load_all_windows(self, tmp_path, rng):
        shape = (16 * 11, 9, 7)
        cube = rng.normal(size=shape).astype(np.float32)
        path = str(tmp_path / "cube")
        zarrlite.write_group(path, {"cube": cube}, chunks=(16, 1, 7))
        ds = ZarrCubeDataset(path, spec=SPEC)
        x = ds.load_all_windows()
        assert x.shape == (6 * 4, 4, 7, 1)
        x_sub = ds.load_all_windows(indices=[2, 0])
        np.testing.assert_allclose(x_sub[:4], ds.item(2))
        np.testing.assert_allclose(x_sub[4:], ds.item(0))

    def test_synthetic_cube_labels_align(self, tmp_path):
        spec = CubeSpec(
            chunk_size=16, window_rows=4, channel_start=1, channel_stride=2
        )
        path = str(tmp_path / "syn")
        labels = make_synthetic_cube(
            path, n_time=16 * 11, n_channels=5, n_freq=31,
            n_classes=3, chunk_rows=16, seed=1, spec=spec,
        )
        ds = ZarrCubeDataset(path, spec=spec)
        assert labels.shape == (ds.n_windows,)
        # Energy-weighted center frequency should separate by planted class:
        # higher class index -> higher center frequency (synthetic_windows
        # places class centers at increasing frequencies).
        x = ds.load_all_windows()[..., 0]  # (n, 4, 31)
        e = np.maximum(x, 0.0).sum(axis=1)  # (n, 31)
        f = np.arange(31)
        centroid = (e * f).sum(-1) / np.maximum(e.sum(-1), 1e-9)
        means = [centroid[labels == k].mean() for k in range(3)]
        assert means[0] < means[1] < means[2]

    def test_rejects_non_chunk_multiple_usable_time(self, tmp_path, rng):
        """usable_time % chunk_size != 0 makes the reference's wrap
        formula mis-assign channels (SURVEY §2.3-adjacent defect); the
        dataset must refuse the geometry instead of silently extracting
        wrong windows (review r2)."""
        spec = CubeSpec(chunk_size=12, window_rows=4, channel_start=1,
                        channel_stride=2)
        path = str(tmp_path / "bad")
        # n_time=11*11 -> usable = 11*2 = 22, not a multiple of 12
        data = rng.normal(size=(121, 5, 7)).astype(np.float32)
        from spectrogram_cube_clustering_tpu.data import zarrlite
        zarrlite.write_array(path, data, chunks=(12, 5, 7))
        with pytest.raises(ValueError, match="multiple of chunk_size"):
            ZarrCubeDataset(path, spec=spec)

    def test_train_val_split(self):
        tra, val = train_val_split(10, train_frac=0.7, seed=2009)
        assert len(tra) == 7 and len(val) == 3
        assert sorted(np.concatenate([tra, val]).tolist()) == list(range(10))
        tra2, _ = train_val_split(10, train_frac=0.7, seed=2009)
        np.testing.assert_array_equal(tra, tra2)

    def test_train_val_split_rejects_empty_side(self):
        """1-item datasets produced an EMPTY train split that streamed
        zero batches and 'trained' at a perfect 0.0 loss (review r3.2)."""
        import pytest

        with pytest.raises(ValueError, match="too small"):
            train_val_split(1, train_frac=0.7)
        with pytest.raises(ValueError, match="too small"):
            train_val_split(3, train_frac=1.0)
