"""Blosc1 codec tests: pure-Python + native C++ decoders vs libblosc.

The reference cube is opened with zarr+dask (Cluster/ZarrDataLoader.py:46-48)
and zarr v2's default compressor is numcodecs Blosc (lz4 + byte-shuffle), so
reading blosc frames byte-exactly is a hard data-boundary requirement.
`tests/fixtures/blosc_store/` holds real libblosc-1.21.3-compressed chunks
committed as golden data; every decode path must reproduce
`blosc_store_expected.npy` exactly.
"""

import itertools
import os

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import native
from spectrogram_cube_clustering_tpu.data import blosc1, zarrlite

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
STORE = os.path.join(FIXTURES, "blosc_store")
EXPECTED = os.path.join(FIXTURES, "blosc_store_expected.npy")

HAVE_LIBBLOSC = blosc1._load_libblosc() is not None


def _datasets(rng):
    return {
        "ramp_f32": (np.arange(20000, dtype=np.float32) * 0.001).tobytes(),
        "rand_u8": rng.integers(0, 256, 20000, dtype=np.uint8).tobytes(),
        "smooth_f64": np.sin(np.linspace(0, 40, 10001)).tobytes(),
        "zeros": bytes(9000),
        "tiny": b"hello blosc world" * 3,
        "empty": b"",
        "odd_tail": rng.integers(0, 4, 20003, dtype=np.uint8).tobytes(),
    }


@pytest.fixture
def no_libblosc(monkeypatch):
    """Force the pure-Python frame parser (simulates hosts without blosc)."""
    monkeypatch.setattr(blosc1, "_libblosc", None)
    monkeypatch.setattr(blosc1, "_libblosc_failed", True)


class TestPureDecoder:
    @pytest.mark.skipif(not HAVE_LIBBLOSC, reason="needs libblosc to compress")
    @pytest.mark.parametrize("cname", ["blosclz", "lz4", "lz4hc", "zlib", "zstd"])
    def test_grid_byte_identical(self, rng, cname):
        datasets = _datasets(rng)
        for (dname, data), shuffle, typesize in itertools.product(
            datasets.items(), [0, 1, 2], [1, 4, 8, 12, 32]
        ):
            frame = blosc1.compress(
                data, typesize=typesize, cname=cname, clevel=5, shuffle=shuffle
            )
            assert blosc1.decompress(frame) == data
            assert blosc1.decompress_pure(frame) == data, (
                dname, cname, shuffle, typesize,
            )

    def test_golden_store_chunks(self, no_libblosc):
        """Committed real-blosc chunks decode exactly (no libblosc used)."""
        expected = np.load(EXPECTED)
        arr = zarrlite.open_array(os.path.join(STORE, "cube"))
        assert arr.compressor_id == "blosc"
        np.testing.assert_array_equal(arr[:, :, :], expected)

    def test_golden_frame_is_real_blosc(self):
        raw = open(os.path.join(STORE, "cube", "0.0.0"), "rb").read()
        assert blosc1.is_blosc(raw)
        assert not (raw[2] & 0x2), "fixture must not be memcpyed"
        nbytes, cbytes, _ = blosc1.cbuffer_sizes(raw)
        assert cbytes < nbytes, "fixture must be genuinely compressed"

    def test_memcpyed_fallback_compressor(self, no_libblosc):
        """Without libblosc, compress() emits valid stored frames."""
        data = os.urandom(1000)
        frame = blosc1.compress(data, typesize=4)
        assert blosc1.is_blosc(frame)
        assert blosc1.decompress_pure(frame) == data
        if HAVE_LIBBLOSC:
            import ctypes

            # same candidate list as blosc1._load_libblosc — hardcoding
            # libblosc.so.1 errors on hosts where HAVE_LIBBLOSC came from
            # another soname (dylib, unversioned .so)
            lib = None
            for name in ("libblosc.so.1", "libblosc.so", "libblosc.dylib"):
                try:
                    lib = ctypes.CDLL(name)
                    break
                except OSError:
                    pass
            assert lib is not None
            lib.blosc_decompress_ctx.restype = ctypes.c_int
            dst = ctypes.create_string_buffer(len(data))
            rc = lib.blosc_decompress_ctx(frame, dst, len(data), 1)
            assert rc == len(data) and dst.raw == data

    def test_truncated_frames_raise(self):
        with pytest.raises(ValueError):
            blosc1.decompress_pure(b"\x02\x01")
        frame = blosc1.compress(b"x" * 4096, typesize=4)
        with pytest.raises(ValueError):
            blosc1.decompress_pure(frame[: len(frame) // 2])
        # the libblosc fast path must also refuse a truncated body:
        # blosc_decompress_ctx takes no srcsize and would overread the
        # heap (review r3)
        with pytest.raises(ValueError):
            blosc1.decompress(frame[: len(frame) // 2])

    def test_corrupt_header_sizes_raise_valueerror(self):
        """blocksize=0 / negative nbytes are the corrupt-frame contract's
        ValueError, not ZeroDivisionError/IndexError (review r3)."""
        import struct

        good = blosc1.compress(b"y" * 1024, typesize=4)
        # non-memcpyed header with blocksize=0
        hdr = bytearray(good[:16])
        hdr[2] &= ~0x2  # clear memcpyed
        struct.pack_into("<i", hdr, 8, 0)
        with pytest.raises(ValueError, match="corrupt blosc header"):
            blosc1.decompress_pure(bytes(hdr) + good[16:])
        struct.pack_into("<i", hdr, 4, -5)
        struct.pack_into("<i", hdr, 8, 256)
        with pytest.raises(ValueError, match="corrupt blosc header"):
            blosc1.decompress_pure(bytes(hdr) + good[16:])

    def test_corrupt_literal_runs_raise(self):
        """Over-long literal/match runs raise instead of silently
        resizing the output bytearray past the final length check
        (review r3, confirmed by experiment)."""
        with pytest.raises(ValueError, match="literal run overruns"):
            blosc1._lz4_decompress_block(memoryview(b"\xa0ABCDE"), 10)
        # blosclz: ctrl byte claims 6 literals, only 3 present
        with pytest.raises(ValueError, match="literal run overruns"):
            blosc1._blosclz_decompress(memoryview(b"\x05abc"), 6)

    def test_truncated_streams_raise_valueerror(self):
        """Streams truncated INSIDE a token (length extension, match
        offset) must keep the ValueError corrupt-frame contract, not leak
        IndexError (review r4)."""
        # lz4: token lit==15 demands extension bytes; none follow
        with pytest.raises(ValueError, match="truncated"):
            blosc1._lz4_decompress_block(memoryview(b"\xf0"), 32)
        # lz4: literals ok, then a match token with only 1 offset byte
        with pytest.raises(ValueError, match="truncated"):
            blosc1._lz4_decompress_block(memoryview(b"\x10a\x01"), 8)
        # blosclz: one literal, then a match ctrl (>=32) whose extended
        # length / offset bytes are cut off (the FIRST byte is masked
        # &31, so the match ctrl must come second)
        with pytest.raises(ValueError, match="truncated"):
            blosc1._blosclz_decompress(memoryview(b"\x00a\xe0"), 16)

    def test_block_start_table_overrun_raises_valueerror(self):
        """blocksize tiny vs nbytes large claims more block-start entries
        than the frame holds — ValueError, not struct.error (review r4)."""
        import struct

        good = blosc1.compress(b"z" * 1024, typesize=4)
        hdr = bytearray(good[:16])
        hdr[2] &= ~0x2  # clear memcpyed
        struct.pack_into("<i", hdr, 4, 1 << 20)  # nbytes = 1 MiB
        struct.pack_into("<i", hdr, 8, 16)       # blocksize = 16
        struct.pack_into("<i", hdr, 12, len(good))
        with pytest.raises(ValueError, match="corrupt blosc header"):
            blosc1.decompress_pure(bytes(hdr) + good[16:])

    @pytest.mark.skipif(not HAVE_LIBBLOSC, reason="needs libblosc to compress")
    def test_differential_fuzz_vs_libblosc(self, rng):
        """Seeded differential fuzz: random sizes/typesizes/levels through
        real libblosc compression must decode byte-identically on the
        pure-Python parser (and the C++ force_own parser when built) —
        the permanent form of the ad-hoc fuzz that caught the
        MIN_BUFFERSIZE split bug (review r3)."""
        native_ok = native.available()
        for trial in range(60):
            n = int(rng.integers(0, 50_000))
            kind = trial % 3
            if kind == 0:
                data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            elif kind == 1:
                data = (
                    np.cumsum(rng.normal(size=n // 4 + 1))
                    .astype(np.float32).tobytes()[:n]
                )
            else:
                data = (
                    b"\x00" * 97
                    + rng.integers(0, 4, 31, dtype=np.uint8).tobytes()
                ) * (n // 128 + 1)
                data = data[:n]
            typesize = int(rng.choice([1, 2, 4, 8, 12, 16, 32]))
            cname = str(rng.choice(["blosclz", "lz4", "zstd", "zlib"]))
            clevel = int(rng.integers(1, 10))
            shuffle = int(rng.integers(0, 3))
            frame = blosc1.compress(
                data, typesize=typesize, cname=cname, clevel=clevel,
                shuffle=shuffle,
            )
            ctx = (trial, n, typesize, cname, clevel, shuffle)
            assert blosc1.decompress_pure(frame) == data, ctx
            if native_ok:
                assert native.blosc_decompress(
                    frame, len(data), force_own=True
                ) == data, ctx

    def test_legacy_no_dont_split_small_block(self):
        """Pre-1.11 frames lack the dont-split bit; c-blosc's decoder
        still does NOT split when blocksize/typesize < MIN_BUFFERSIZE
        (=128). The parsers used to assume typesize splits there and
        failed on frames libblosc reads fine (review r3, confirmed)."""
        import struct

        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
        typesize, nbytes = 4, 64
        # stored layout is the shuffled block
        arr = np.frombuffer(data, np.uint8).reshape(-1, typesize)
        shuf = arr.T.tobytes()
        # header: version 2, flags = shuffle | lz4 codec, NO dont-split
        flags = 0x1 | (1 << 5)
        header = struct.pack(
            "<BBBBiii", 2, 1, flags, typesize, nbytes, nbytes,
            16 + 4 + 4 + nbytes,
        )
        # one block: bstarts[0]=20, then ONE raw stream (csize==neblock)
        frame = header + struct.pack("<i", 20) + struct.pack("<i", nbytes) + shuf
        assert blosc1.decompress_pure(frame) == data
        if HAVE_LIBBLOSC:
            assert blosc1.decompress(frame) == data
        if native.available():
            assert native.blosc_decompress(
                frame, nbytes, force_own=True
            ) == data


class TestNativeDecoder:
    @pytest.mark.skipif(not native.available(), reason="no native toolchain")
    @pytest.mark.skipif(not HAVE_LIBBLOSC, reason="needs libblosc to compress")
    @pytest.mark.parametrize("force_own", [False, True])
    def test_grid_byte_identical(self, rng, force_own):
        datasets = _datasets(rng)
        for (dname, data), cname, shuffle, typesize in itertools.product(
            datasets.items(), ["blosclz", "lz4", "zstd"], [0, 1, 2], [1, 4, 12]
        ):
            frame = blosc1.compress(
                data, typesize=typesize, cname=cname, clevel=5, shuffle=shuffle
            )
            out = native.blosc_decompress(frame, len(data), force_own=force_own)
            assert out == data, (dname, cname, shuffle, typesize, force_own)

    @pytest.mark.skipif(not native.available(), reason="no native toolchain")
    def test_golden_store_via_native_batch(self):
        """decode_chunks (thread-pool path) handles blosc framing."""
        expected = np.load(EXPECTED)
        arr = zarrlite.open_array(os.path.join(STORE, "cube"))
        paths = [arr._chunk_path((i, 0, 0)) for i in range(6)]
        out = native.decode_chunks(paths, arr.chunks, arr.dtype, "blosc")
        assert out is not None
        np.testing.assert_array_equal(
            out.reshape(96, 9, 7), expected
        )

    @pytest.mark.skipif(not native.available(), reason="no native toolchain")
    def test_corrupt_chunk_fails_loudly(self, tmp_path):
        p = tmp_path / "bad"
        p.write_bytes(b"\x02\x01\x21\x04" + b"\x00" * 400)
        with pytest.raises(IOError):
            native.decode_chunks([str(p)], (25,), np.float32, "blosc")


class TestZarrliteBlosc:
    def test_roundtrip_blosc_store(self, tmp_path, rng):
        data = rng.normal(size=(33, 7, 5)).astype(np.float32)
        path = str(tmp_path / "z")
        zarrlite.write_array(path, data, chunks=(8, 7, 5), compressor="blosc")
        arr = zarrlite.open_array(path)
        np.testing.assert_array_equal(arr[:, :, :], data)
        np.testing.assert_array_equal(arr[5:21, 3, :], data[5:21, 3, :])

    def test_cube_dataset_over_blosc_store(self, tmp_path):
        """End-to-end: the cube windower reads a blosc-compressed store."""
        from spectrogram_cube_clustering_tpu.data import CubeSpec, ZarrCubeDataset

        rng = np.random.default_rng(7)
        cube = rng.normal(size=(16 * 11, 9, 7)).astype(np.float32)
        spec = CubeSpec(chunk_size=16, window_rows=4, channel_start=1, channel_stride=2)
        path = str(tmp_path / "cube_store")
        zarrlite.write_group(path, {"cube": cube}, chunks=(16, 1, 7), compressor="blosc")
        ds = ZarrCubeDataset(path, spec=spec)
        ref_path = str(tmp_path / "cube_store_raw")
        zarrlite.write_group(ref_path, {"cube": cube}, chunks=(16, 1, 7), compressor=None)
        ds_ref = ZarrCubeDataset(ref_path, spec=spec)
        for i in [0, 1, len(ds) - 1]:
            np.testing.assert_array_equal(ds[i], ds_ref[i])
