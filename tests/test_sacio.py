"""Native SAC/miniSEED IO + trace ops (`analysis.sacio`) — the obspy-free
backend behind `seismic.sac2mseed(backend='native')`.

Covers: SAC binary roundtrip in both byte orders, miniSEED record
roundtrip (multi-record, sub-1Hz rates), each preprocessing op against a
scipy/numpy oracle, stream merge gap/overlap semantics, and the full
SAC->MSEED pipeline end-to-end with planted tones (reference:
Cluster/environment.py:167-250).
"""

import numpy as np
import pytest
from datetime import datetime, timedelta

from spectrogram_cube_clustering_tpu.analysis import sacio, seismic
from spectrogram_cube_clustering_tpu.analysis.sacio import (
    Stats, Stream, Trace,
)


def _trace(n=1000, fs=20.0, t0=None, data=None, **ids):
    stats = Stats(starttime=t0 or datetime(2015, 1, 2, 3, 4, 5),
                  sampling_rate=fs, npts=n, **ids)
    if data is None:
        rng = np.random.default_rng(0)
        data = rng.normal(size=n)
    return Trace(data, stats)


class TestSacRoundtrip:
    @pytest.mark.parametrize("order", ["<", ">"])
    def test_roundtrip_both_byteorders(self, tmp_path, order):
        tr = _trace(n=777, fs=100.0, network="KP", station="KPDR",
                    location="", channel="HDH")
        p = tmp_path / "x.SAC"
        sacio.write_sac(str(p), tr, byteorder=order)
        rd = sacio.read_sac(str(p))
        np.testing.assert_allclose(rd.data, tr.data, rtol=1e-6)
        assert rd.stats.npts == 777
        assert rd.stats.sampling_rate == pytest.approx(100.0)
        assert rd.stats.starttime == tr.stats.starttime
        assert (rd.stats.network, rd.stats.station, rd.stats.location,
                rd.stats.channel) == ("KP", "KPDR", "", "HDH")

    def test_subsecond_start(self, tmp_path):
        t0 = datetime(2015, 6, 1, 0, 0, 0, 250000)
        tr = _trace(n=10, t0=t0)
        p = tmp_path / "x.SAC"
        sacio.write_sac(str(p), tr)
        assert sacio.read_sac(str(p)).stats.starttime == t0

    def test_rejects_non_sac(self, tmp_path):
        p = tmp_path / "junk"
        p.write_bytes(b"\x00" * 700)
        with pytest.raises(ValueError, match="NVHDR"):
            sacio.read_sac(str(p))

    def test_read_dispatches_sac(self, tmp_path):
        tr = _trace(n=64)
        p = tmp_path / "a.SAC"
        sacio.write_sac(str(p), tr)
        st = sacio.read(str(p))
        assert isinstance(st, Stream) and len(st) == 1
        np.testing.assert_allclose(st[0].data, tr.data, rtol=1e-6)


class TestMseedRoundtrip:
    def test_multi_record_roundtrip(self, tmp_path):
        # > 1008 samples forces multiple 4096-byte records
        tr = _trace(n=2500, fs=200.0, network="KP", station="KPDR",
                    location="", channel="HDH")
        p = tmp_path / "x.mseed"
        sacio.write_mseed(str(p), tr)
        assert p.stat().st_size == 3 * 4096
        rd = sacio.read_mseed(str(p))
        np.testing.assert_allclose(rd.data, tr.data, rtol=1e-6)
        assert rd.stats.starttime == tr.stats.starttime
        assert rd.stats.sampling_rate == pytest.approx(200.0)
        assert rd.stats.station == "KPDR"
        assert rd.stats.channel == "HDH"

    def test_sub_hz_rate(self, tmp_path):
        # the pipeline's post-decimation rate (0.2 Hz) uses the negative
        # period encoding
        tr = _trace(n=100, fs=0.2)
        p = tmp_path / "x.mseed"
        sacio.write_mseed(str(p), tr)
        rd = sacio.read_mseed(str(p))
        assert rd.stats.sampling_rate == pytest.approx(0.2)
        np.testing.assert_allclose(rd.data, tr.data, rtol=1e-6)

    def test_non_integral_rate(self, tmp_path):
        tr = _trace(n=50, fs=6.25)
        p = tmp_path / "x.mseed"
        sacio.write_mseed(str(p), tr)
        assert sacio.read_mseed(str(p)).stats.sampling_rate == pytest.approx(
            6.25)

    def test_read_dispatches_mseed(self, tmp_path):
        tr = _trace(n=64)
        p = tmp_path / "a.mseed"
        sacio.write_mseed(str(p), tr)
        st = sacio.read(str(p))
        assert len(st) == 1
        np.testing.assert_allclose(st[0].data, tr.data, rtol=1e-6)

    def test_high_rate_uses_multiplier(self, tmp_path):
        # int16 factor field caps at 32767: 40 kHz must encode as
        # factor x multiplier, not crash in struct.pack
        tr = _trace(n=64, fs=40_000.0)
        p = tmp_path / "x.mseed"
        sacio.write_mseed(str(p), tr)
        rd = sacio.read_mseed(str(p))
        assert rd.stats.sampling_rate == pytest.approx(40_000.0)
        np.testing.assert_allclose(rd.data, tr.data, rtol=1e-6)

    def test_unencodable_rate_raises(self):
        # a prime above 32767 has no int16 factor x multiplier split
        with pytest.raises(ValueError, match="cannot encode"):
            sacio._rate_factor(32771.0)

    def test_empty_trace_roundtrip(self, tmp_path):
        # a trace trimmed to zero samples still writes one record so the
        # reader round-trips it instead of choking on a 0-byte file
        tr = _trace(n=0, fs=100.0, station="KPDR")
        p = tmp_path / "empty.mseed"
        sacio.write_mseed(str(p), tr)
        assert p.stat().st_size == 4096
        rd = sacio.read_mseed(str(p))
        assert len(rd.data) == 0
        assert rd.stats.station == "KPDR"
        assert rd.stats.sampling_rate == pytest.approx(100.0)

    def test_zero_byte_file_raises(self, tmp_path):
        p = tmp_path / "nothing.mseed"
        p.write_bytes(b"")
        with pytest.raises(ValueError, match="no miniSEED records"):
            sacio.read_mseed(str(p))


class TestTraceOps:
    def test_trim_nearest_sample(self):
        t0 = datetime(2015, 1, 1)
        tr = _trace(n=100, fs=1.0, t0=t0, data=np.arange(100.0))
        tr.trim(starttime=t0 + timedelta(seconds=10),
                endtime=t0 + timedelta(seconds=20))
        np.testing.assert_array_equal(tr.data, np.arange(10.0, 21.0))
        assert tr.stats.starttime == t0 + timedelta(seconds=10)
        assert tr.stats.npts == 11
        assert tr.stats.endtime == t0 + timedelta(seconds=20)

    def test_constructor_copies_stats(self):
        """Trace(data, other.stats) must not mutate or alias the donor's
        header (obspy copies it; review r3: the shared object let a trim
        on the child advance the parent's starttime and overwrite its
        npts)."""
        t0 = datetime(2015, 1, 1)
        tr1 = _trace(n=100, fs=1.0, t0=t0, data=np.arange(100.0))
        from spectrogram_cube_clustering_tpu.analysis.sacio import Trace

        tr2 = Trace(tr1.data[:10], tr1.stats)
        assert tr1.stats.npts == 100  # donor untouched
        assert tr2.stats.npts == 10
        tr2.trim(starttime=t0 + timedelta(seconds=5))
        assert tr1.stats.starttime == t0

    def test_remove_trace_taper_with_datetime_stats(self, tmp_path):
        """remove_trace(taper_half_width=...) on a native sacio Trace
        (datetime start/end) must compute the taper fraction instead of
        TypeError-ing on float/timedelta division (review r3)."""
        from spectrogram_cube_clustering_tpu.analysis import seismic

        resp = tmp_path / "RESP.t"
        resp.write_text(
            "B058F04     Sensitivity:    1.00000E+00\n"
            "B053F03     Transfer function type:                A\n"
            "B053F04     Stage sequence number:                 1\n"
            "B053F05     Response in units lookup:              M/S - v\n"
            "B053F07     A0 normalization factor:               1.0\n"
            "B053F15-18     0  -1.00000E+00  +0.00000E+00  0 0\n"
        )
        t0 = datetime(2015, 1, 1)
        tr = _trace(n=3600, fs=1.0, t0=t0,
                    data=np.sin(2 * np.pi * 0.05 * np.arange(3600.0)))
        before = tr.data.copy()
        seismic.remove_trace(
            tr, str(resp), units="VEL", taper_half_width=180.0
        )
        assert np.isfinite(tr.data).all()
        assert not np.allclose(tr.data, before)

    def test_trim_clips_to_available(self):
        t0 = datetime(2015, 1, 1)
        tr = _trace(n=10, fs=1.0, t0=t0, data=np.arange(10.0))
        tr.trim(starttime=t0 - timedelta(seconds=5),
                endtime=t0 + timedelta(seconds=100))
        assert tr.stats.npts == 10
        assert tr.stats.starttime == t0

    def test_detrend_linear(self):
        t = np.arange(200.0)
        tr = _trace(n=200, data=3.0 + 0.5 * t)
        tr.detrend(type="linear")
        assert np.abs(tr.data).max() < 1e-9

    def test_taper_hann_max_length(self):
        # 1000 samples at 1 Hz, max_percentage=0.5 (500), max_length=100 s
        # (100 samples) -> 100-sample ramps, middle untouched
        tr = _trace(n=1000, fs=1.0, data=np.ones(1000))
        tr.taper(max_percentage=0.5, type="hann", max_length=100)
        assert tr.data[0] == 0.0
        assert np.all(tr.data[100:900] == 1.0)
        assert tr.data[50] == pytest.approx(0.5)  # hann midpoint
        np.testing.assert_allclose(tr.data[:100], tr.data[-100:][::-1])

    def test_trace_owns_its_data(self):
        # in-place ops (taper) must neither mutate the caller's float64
        # array nor raise on read-only buffers (mmap/frombuffer inputs)
        src = np.ones(64, np.float64)
        tr = sacio.Trace(src)
        tr.taper(max_percentage=0.5, type="hann")
        assert np.all(src == 1.0)
        ro = np.ones(64, np.float64)
        ro.setflags(write=False)
        sacio.Trace(ro).taper(max_percentage=0.5, type="hann")

    def test_zerophase_lowpass_attenuates(self):
        fs, n = 100.0, 8192
        t = np.arange(n) / fs
        lo = np.sin(2 * np.pi * 0.5 * t)
        hi = np.sin(2 * np.pi * 20.0 * t)
        tr = _trace(n=n, fs=fs, data=lo + hi)
        tr.filter("lowpass", freq=2.0, corners=2, zerophase=True)
        core = slice(n // 4, -n // 4)
        # 20 Hz is 10x the corner: 2-corner two-pass ~ -80 dB; check in
        # the spectrum (the time-domain residual is dominated by the
        # passband's own ~0.8% Butterworth droop at 0.5/2.0 Hz)
        w = np.hanning(n - n // 2)  # window, else 0.5 Hz leakage floors it
        spec = np.abs(np.fft.rfft(tr.data[core] * w))
        f = np.fft.rfftfreq(n - n // 2, 1 / fs)
        assert (spec[np.argmin(np.abs(f - 20.0))]
                < 1e-3 * spec[np.argmin(np.abs(f - 0.5))])
        # zero phase: no lag on the passband tone
        assert np.corrcoef(tr.data[core], lo[core])[0, 1] > 0.99999

    def test_bandpass_rejects_out_of_band(self):
        fs, n = 10.0, 16384
        t = np.arange(n) / fs
        inband = np.sin(2 * np.pi * 0.02 * t)
        out_lo = np.sin(2 * np.pi * 0.0001 * t)
        out_hi = np.sin(2 * np.pi * 2.0 * t)
        tr = _trace(n=n, fs=fs, data=inband + out_lo + out_hi)
        tr.filter("bandpass", freqmin=0.001, freqmax=0.04, zerophase=True)
        spec = np.abs(np.fft.rfft(tr.data))
        f = np.fft.rfftfreq(n, 1 / fs)
        assert spec[np.argmin(np.abs(f - 2.0))] < 1e-4 * spec.max()

    def test_filter_validates_nyquist(self):
        tr = _trace(n=100, fs=1.0)
        with pytest.raises(ValueError, match="Nyquist"):
            tr.filter("lowpass", freq=0.6)
        with pytest.raises(ValueError, match="Nyquist"):
            tr.filter("bandpass", freqmin=0.01, freqmax=0.9)

    def test_decimate_no_filter(self):
        tr = _trace(n=1000, fs=100.0, data=np.arange(1000.0))
        tr.decimate(100, no_filter=True)
        np.testing.assert_array_equal(tr.data, np.arange(0.0, 1000.0, 100.0))
        assert tr.stats.sampling_rate == pytest.approx(1.0)
        assert tr.stats.npts == 10

    def test_simulate_raises(self):
        with pytest.raises(NotImplementedError, match="simulate"):
            _trace().simulate(seedresp={})


class TestStreamMerge:
    def test_gap_interpolated(self):
        t0 = datetime(2015, 1, 1)
        a = _trace(n=10, fs=1.0, t0=t0, data=np.full(10, 2.0),
                   station="S", channel="C")
        # 5-sample gap, then a constant-4 trace
        b = _trace(n=10, fs=1.0, t0=t0 + timedelta(seconds=15),
                   data=np.full(10, 4.0), station="S", channel="C")
        st = Stream([a]) + Stream([b])
        st.merge(method=1, fill_value="interpolate")
        assert len(st) == 1
        tr = st[0]
        assert tr.stats.npts == 25
        # gap samples ramp linearly from 2 (sample 9) to 4 (sample 15)
        np.testing.assert_allclose(
            tr.data[9:16], np.linspace(2.0, 4.0, 7))

    def test_overlap_crossfades_to_later_trace(self):
        t0 = datetime(2015, 1, 1)
        a = _trace(n=20, fs=1.0, t0=t0, data=np.zeros(20),
                   station="S", channel="C")
        b = _trace(n=20, fs=1.0, t0=t0 + timedelta(seconds=10),
                   data=np.ones(20), station="S", channel="C")
        st = Stream([a, b])
        st.merge(method=1, interpolation_samples=5)
        tr = st[0]
        assert tr.stats.npts == 30
        np.testing.assert_array_equal(tr.data[:10], 0.0)
        # crossfade strictly inside (0, 1) over the first 5 overlap samples
        fade = tr.data[10:15]
        assert np.all(np.diff(fade) > 0)
        assert np.all((fade > 0) & (fade < 1))
        np.testing.assert_array_equal(tr.data[15:], 1.0)

    def test_distinct_ids_not_merged(self):
        a = _trace(station="A")
        b = _trace(station="B")
        st = Stream([a, b])
        st.merge()
        assert len(st) == 2

    def test_out_of_order_traces_sorted(self):
        t0 = datetime(2015, 1, 1)
        late = _trace(n=5, fs=1.0, t0=t0 + timedelta(seconds=5),
                      data=np.full(5, 7.0), station="S")
        early = _trace(n=5, fs=1.0, t0=t0, data=np.full(5, 3.0),
                       station="S")
        st = Stream([late, early])
        st.merge()
        tr = st[0]
        assert tr.stats.starttime == t0
        np.testing.assert_array_equal(tr.data[:5], 3.0)
        np.testing.assert_array_equal(tr.data[5:], 7.0)


class TestNativeSac2Mseed:
    """The full pipeline (environment.py:167-250) executing end-to-end
    with zero obspy: synthetic daily SAC files -> merged/detrended/
    tapered/lowpassed/decimated/bandpassed day-long MSEED."""

    FS = 20.0

    def _write_days(self, datadir, n_days=4, f_in_band=0.01, f_reject=0.3):
        nd = int(86400 * self.FS)
        for d in range(1, n_days + 1):
            t0 = datetime(2015, 1, d)
            # global time axis so tones are continuous across file edges
            t = (np.arange(nd) + (d - 1) * nd) / self.FS
            x = (np.sin(2 * np.pi * f_in_band * t)
                 + 0.5 * np.sin(2 * np.pi * f_reject * t)
                 + 0.01 * (d - 1))  # small per-day offset -> detrended
            tr = Trace(x, Stats(network="KP", station="KPDR", location="",
                                channel="HDH", starttime=t0,
                                sampling_rate=self.FS, npts=nd))
            name = t0.strftime("%Y.%j.%H.%M.%S") + ".KPDR.HDH.SAC"
            sacio.write_sac(str(datadir / name), tr)

    def test_end_to_end(self, tmp_path):
        datadir = tmp_path / "sac"
        destdir = tmp_path / "mseed"
        datadir.mkdir()
        self._write_days(datadir, n_days=4)

        written = seismic.sac2mseed(
            str(datadir), str(destdir), response=False, backend="native",
            taper_trace=10, pre_feed=20, decimation=100,
            lowpass_hz=0.4, band=(0.001, 0.04),
        )
        # days 2..3 convertible (first/last only feed buffers)
        assert len(written) == 2
        import os
        assert os.path.basename(written[0]) == (
            "KP.KPDR..HDH__20150102T000000Z__20150103T000000Z.mseed")

        out = sacio.read_mseed(written[0])
        # day-long at fs/100, trimmed to [t0, t1] nearest-sample inclusive
        assert out.stats.sampling_rate == pytest.approx(self.FS / 100)
        assert out.stats.starttime == datetime(2015, 1, 2)
        assert abs(out.stats.npts - 86400 * self.FS / 100) <= 1
        assert np.isfinite(out.data).all()

        # planted 0.01 Hz tone survives the band (0.001-0.04); the
        # 0.3 Hz tone is killed by the 0.4 Hz lowpass + 0.04 bandpass
        spec = np.abs(np.fft.rfft(out.data))
        f = np.fft.rfftfreq(out.stats.npts, 1.0 / out.stats.sampling_rate)
        pk = f[np.argmax(spec)]
        assert pk == pytest.approx(0.01, abs=2 * f[1])
        hi = spec[f > 0.05].max() if (f > 0.05).any() else 0.0
        assert hi < 1e-3 * spec.max()
        # in-band amplitude is preserved (~1.0 planted)
        amp = 2 * spec.max() / out.stats.npts
        assert amp == pytest.approx(1.0, rel=0.05)

    def test_backend_auto_without_obspy_is_native(self, tmp_path,
                                                  monkeypatch):
        import builtins
        real_import = builtins.__import__

        def no_obspy(name, *a, **k):
            if name == "obspy":
                raise ImportError("no obspy")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_obspy)
        be = seismic._backend("auto")
        assert be.read is sacio.read
        with pytest.raises(ImportError, match="obspy"):
            seismic._backend("obspy")

    def test_backend_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown backend"):
            seismic._backend("matlab")
