"""analysis.seismic tests with a STUBBED obspy (VERDICT r1 #7).

obspy is not installed in this image, so these tests exercise the module's
real logic — day-window arithmetic, buffer sizing, filename generation, the
preprocessing op sequence, RESP metadata parsing, response-file matching,
and the remove_stream loop — against fake Trace/Stream objects that record
every call. Reference anchors: environment.py:149-250 (sac2mseed),
262-521 (response pipeline).
"""

import os
import sys
import types
from datetime import datetime, timedelta

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu.analysis import seismic


# ---------------------------------------------------------------------------
# obspy stub


class FakeStats:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FakeTrace:
    def __init__(self, stats=None):
        self.ops = []
        self.stats = stats or FakeStats(
            network="KP", station="KPDR", location="", channel="HDH",
            starttime=0.0, endtime=86400.0,
        )

    def trim(self, starttime=None, endtime=None):
        self.ops.append(("trim", starttime, endtime))
        return self

    def detrend(self, type=None):
        self.ops.append(("detrend", type))

    def taper(self, **kw):
        self.ops.append(("taper", kw))

    def filter(self, kind, **kw):
        self.ops.append(("filter", kind, kw))

    def decimate(self, factor, **kw):
        self.ops.append(("decimate", factor))

    def simulate(self, **kw):
        self.ops.append(("simulate", kw))

    def write(self, dest, format=None):
        self.ops.append(("write", dest, format))
        with open(dest, "w") as f:
            f.write("mseed")


class FakeStream:
    def __init__(self, traces):
        self.traces = list(traces)
        self.merged = 0

    def __add__(self, other):
        return FakeStream(self.traces + other.traces)

    def __getitem__(self, i):
        return self.traces[i]

    def __iter__(self):
        return iter(self.traces)

    def __len__(self):
        return len(self.traces)

    def merge(self, **kw):
        self.merged += 1
        self.merge_kwargs = kw


@pytest.fixture
def fake_obspy(monkeypatch):
    mod = types.ModuleType("obspy")
    mod.read_paths = []

    def read(path):
        mod.read_paths.append(path)
        return FakeStream([FakeTrace()])

    mod.read = read
    mod.UTCDateTime = lambda t: t  # passthrough: windows stay datetimes
    monkeypatch.setitem(sys.modules, "obspy", mod)
    return mod


# ---------------------------------------------------------------------------
# pure helpers (no obspy at all)


class TestFile2dt:
    def test_parses_julian_day_names(self):
        dt = seismic.file2dt("2015.032.01.02.03.KPDR.HDH.SAC")
        assert dt == datetime(2015, 2, 1, 1, 2, 3)


RESP_TEXT = """\
B050F03     Station:     KPDR
B050F16     Network:     KP
B052F03     Location:    ??
B052F04     Channel:     HDH
B052F22     Start date:  2014,001,00:00:00
B052F23     End date:    2016,366,23:59:59
B057F04     Input sample rate (hz):        200.0
B057F05     Decimation factor:      1
B058F04     Sensitivity:    5.24814E+08
B058F05     Frequency of sensitivity:  0.02 HZ
"""


class TestRespParsing:
    def test_read_resp_metadata(self, tmp_path):
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(RESP_TEXT)
        info = seismic.read_resp_metadata(str(p))
        assert info["station"] == "KPDR"
        assert info["network"] == "KP"
        assert info["location"] == ""  # ?? -> empty, like the reference
        assert info["channel"] == "HDH"
        assert info["t_start"] == datetime(2014, 1, 1)
        assert info["sensitivity"] == pytest.approx(5.24814e8)
        assert info["frequency_sensitivity"] == pytest.approx(0.02)
        assert info["sampling_rate"] == pytest.approx(200.0)

    def test_conflicting_station_raises(self, tmp_path):
        p = tmp_path / "RESP.bad"
        p.write_text(RESP_TEXT + "B050F03     Station:     OTHER\n")
        with pytest.raises(ValueError, match="Multiple station"):
            seismic.read_resp_metadata(str(p))

    def test_missing_decimation_raises(self, tmp_path):
        p = tmp_path / "RESP.nodec"
        p.write_text("B050F03     Station:     KPDR\n")
        with pytest.raises(ValueError, match="Decimation"):
            seismic.read_resp_metadata(str(p))

    def test_find_resp_file_matches_stats(self, tmp_path):
        p1 = tmp_path / "RESP.KP.KPDR..HDH"
        p1.write_text(RESP_TEXT)
        p2 = tmp_path / "RESP.XX.OTHR..BHZ"
        p2.write_text(
            RESP_TEXT.replace("KPDR", "OTHR").replace(
                "Network:     KP", "Network:     XX"
            ).replace("Channel:     HDH", "Channel:     BHZ")
        )
        stats = FakeStats(network="KP", station="KPDR", location="",
                          channel="HDH")
        assert seismic.find_resp_file(stats, [str(p2), str(p1)]) == str(p1)
        stats_miss = FakeStats(network="ZZ", station="NONE", location="",
                               channel="XXX")
        with pytest.raises(ValueError, match="No corresponding"):
            seismic.find_resp_file(stats_miss, [str(p1), str(p2)])

    def test_read_response_function(self, tmp_path):
        p = tmp_path / "AMP.KP.KPDR..HDH"
        p.write_text("0.001 1.5e8\n0.01 2.5e8\n\n")
        f, v = seismic.read_response_function(str(p))
        np.testing.assert_allclose(f, [0.001, 0.01])
        np.testing.assert_allclose(v, [1.5e8, 2.5e8])


# ---------------------------------------------------------------------------
# sac2mseed window arithmetic + op sequence (stubbed obspy)


class TestSac2Mseed:
    def _make_sac_files(self, datadir, n_days=5):
        for d in range(1, n_days + 1):
            name = f"2015.{d:03d}.00.00.00.KPDR.HDH.SAC"
            (datadir / name).write_text("sac")

    def test_day_windows_and_filenames(self, fake_obspy, tmp_path):
        datadir = tmp_path / "sac"
        destdir = tmp_path / "mseed"
        datadir.mkdir()
        self._make_sac_files(datadir, n_days=5)

        written = seismic.sac2mseed(
            str(datadir), str(destdir), response=False,
            taper_trace=10, pre_feed=20,
        )
        # days 2..4 are convertible (first/last days only feed buffers)
        assert len(written) == 3
        names = [os.path.basename(p) for p in written]
        assert names[0] == "KP.KPDR..HDH__20150102T000000Z__20150103T000000Z.mseed"
        assert names[-1] == "KP.KPDR..HDH__20150104T000000Z__20150105T000000Z.mseed"
        for p in written:
            assert os.path.exists(p)

    def test_zero_buffer_includes_endtime_day(
        self, fake_obspy, tmp_path, monkeypatch
    ):
        """taper_trace=0 lands time_stop exactly on midnight; ceil('D')
        is a no-op there and the reference's [:-1] day-drop would exclude
        the file holding the inclusive endtime sample (review r3 — the
        reference's hardcoded positive buffer hides this)."""
        datadir = tmp_path / "sac"
        destdir = tmp_path / "mseed"
        datadir.mkdir()
        self._make_sac_files(datadir, n_days=4)

        read_paths = []
        orig_read = fake_obspy.read

        def read(path):
            read_paths.append(os.path.basename(path))
            return orig_read(path)

        monkeypatch.setattr(fake_obspy, "read", read)
        seismic.sac2mseed(
            str(datadir), str(destdir), taper_trace=0, pre_feed=0,
        )
        # converting day 2 (t1 = day 3 midnight) must read day 3's file
        assert any(p.startswith("2015.003") for p in read_paths)

    def test_buffer_and_op_sequence(self, fake_obspy, tmp_path, monkeypatch):
        datadir = tmp_path / "sac"
        destdir = tmp_path / "mseed"
        datadir.mkdir()
        self._make_sac_files(datadir, n_days=3)

        seen = []
        orig_read = fake_obspy.read

        def read(path):
            st = orig_read(path)
            seen.append(st[0])
            return st

        monkeypatch.setattr(fake_obspy, "read", read)
        seismic.sac2mseed(
            str(datadir), str(destdir), taper_trace=10, pre_feed=20,
            decimation=100, lowpass_hz=0.4, band=(0.001, 0.04),
        )
        tr = seen[0]  # merged stream's first trace carries all ops
        kinds = [op[0] for op in tr.ops]
        assert kinds == [
            "trim", "detrend", "taper", "filter", "decimate", "filter",
            "trim", "write",
        ]
        # first trim: [day - (taper+prefeed) min, day+1 + taper min]
        _, t0, t1 = tr.ops[0]
        assert t1 - t0 == timedelta(days=1, minutes=40)
        day = datetime(2015, 1, 2)
        assert t0 == day - timedelta(minutes=30)
        assert t1 == day + timedelta(days=1, minutes=10)
        # lowpass before decimation, bandpass after
        assert tr.ops[3][1] == "lowpass"
        assert tr.ops[3][2]["freq"] == 0.4
        assert tr.ops[4][1] == 100
        assert tr.ops[5][1] == "bandpass"
        assert tr.ops[5][2] == {
            "freqmin": 0.001, "freqmax": 0.04, "zerophase": True
        }
        # final trim lands exactly on the day
        _, f0, f1 = tr.ops[6]
        assert (f0, f1) == (day, day + timedelta(days=1))

    def test_too_few_files_raises(self, fake_obspy, tmp_path):
        datadir = tmp_path / "sac"
        datadir.mkdir()
        self._make_sac_files(datadir, n_days=2)
        with pytest.raises(ValueError, match="Not enough SAC files"):
            seismic.sac2mseed(str(datadir), str(tmp_path / "out"))

    def test_response_requires_resp_file(self, fake_obspy, tmp_path):
        datadir = tmp_path / "sac"
        datadir.mkdir()
        self._make_sac_files(datadir, n_days=3)
        with pytest.raises(FileNotFoundError, match="RESP"):
            seismic.sac2mseed(str(datadir), str(tmp_path / "out"),
                              response=True)


# ---------------------------------------------------------------------------
# remove_trace / remove_stream (stub traces; no obspy import needed)


class TestRemoveStream:
    def test_remove_stream_merges_and_matches_per_trace(self, tmp_path):
        p1 = tmp_path / "RESP.KP.KPDR..HDH"
        p1.write_text(RESP_TEXT)
        p2 = tmp_path / "RESP.KP.OTHR..HDH"
        p2.write_text(RESP_TEXT.replace("KPDR", "OTHR"))

        tr1 = FakeTrace(FakeStats(network="KP", station="KPDR", location="",
                                  channel="HDH", starttime=0.0,
                                  endtime=3600.0))
        tr2 = FakeTrace(FakeStats(network="KP", station="OTHR", location="",
                                  channel="HDH", starttime=0.0,
                                  endtime=3600.0))
        st = FakeStream([tr1, tr2])
        seismic.remove_stream(
            st, [str(p1), str(p2)], units="displacement",
            taper_half_width=180.0,
        )
        assert st.merged == 1
        (op1,) = tr1.ops
        (op2,) = tr2.ops
        assert op1[0] == op2[0] == "simulate"
        assert op1[1]["seedresp"] == {"filename": str(p1), "units": "DIS"}
        assert op2[1]["seedresp"]["filename"] == str(p2)
        # taper_fraction = 2*half_width / duration
        assert op1[1]["taper_fraction"] == pytest.approx(360.0 / 3600.0)

    def test_remove_response_fallback_kwargs(self, tmp_path, monkeypatch):
        """The sac2mseed obspy fallback must mirror the reference's exact
        simulate invocation (environment.py:236-242) — notably
        pitsasim=False, which obspy defaults to True."""
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(RESP_TEXT)
        monkeypatch.setattr(
            seismic, "remove_response_native",
            lambda *a, **k: (_ for _ in ()).throw(ValueError("forced")),
        )
        monkeypatch.setattr(seismic, "_obspy", lambda: None)
        tr = FakeTrace()
        tr.data = np.zeros(16)
        seismic.remove_response(tr, str(p), units="VEL",
                                pre_filt=(0.01, 0.02, 8.0, 9.0))
        (op,) = tr.ops
        assert op[0] == "simulate"
        assert op[1]["pitsasim"] is False
        assert op[1]["sacsim"] is True
        assert op[1]["paz_remove"] is None
        assert op[1]["seedresp"] == {"filename": str(p), "units": "VEL"}

    def test_remove_trace_without_taper(self, tmp_path):
        p1 = tmp_path / "RESP.KP.KPDR..HDH"
        p1.write_text(RESP_TEXT)
        tr = FakeTrace()
        seismic.remove_trace(tr, str(p1), units="VEL", water_level=60)
        (op,) = tr.ops
        assert op[1]["seedresp"]["units"] == "VEL"
        assert op[1]["water_level"] == 60
        assert "taper_fraction" not in op[1]


# ---------------------------------------------------------------------------
# native pole-zero deconvolution (no obspy, no evalresp binary)

RESP_PAZ_TEXT = RESP_TEXT + """\
B053F03     Transfer function type:                A
B053F04     Stage sequence number:                 1
B053F05     Response in units lookup:              M/S - Velocity in Meters Per Second
B053F06     Response out units lookup:             V - Volts
B053F07     A0 normalization factor:               2.0
B053F08     Normalization frequency:               0.02
B053F09     Number of zeroes:                      2
B053F14     Number of poles:                       2
B053F10-13     0  +0.00000E+00  +0.00000E+00  +0.00000E+00  +0.00000E+00
B053F10-13     1  +0.00000E+00  +0.00000E+00  +0.00000E+00  +0.00000E+00
B053F15-18     0  -2.00000E+00  +2.00000E+00  +0.00000E+00  +0.00000E+00
B053F15-18     1  -2.00000E+00  -2.00000E+00  +0.00000E+00  +0.00000E+00
"""

SENS = 5.24814e8
A0 = 2.0
# fast poles (decay ~0.5 s) keep the truncated-convolution tail
# negligible so the roundtrip comparison isolates the deconvolution
POLES = [-2.0 + 2.0j, -2.0 - 2.0j]


def _analytic_response(freqs):
    """Hand-written H(f) for RESP_PAZ_TEXT in counts per (m/s): the test's
    independent oracle for the library's RESP evaluation."""
    s = 2j * np.pi * np.asarray(freqs, np.float64)
    num = s * s  # two zeros at the origin
    den = (s - POLES[0]) * (s - POLES[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        h = SENS * A0 * np.where(den == 0, 0.0, num / den)
    return h


class TestNativeDeconvolution:
    @pytest.fixture
    def resp_paz(self, tmp_path):
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(RESP_PAZ_TEXT)
        return str(p)

    def test_parse_resp_paz(self, resp_paz):
        paz = seismic.parse_resp_paz(resp_paz)
        assert paz["sensitivity"] == pytest.approx(SENS)
        assert paz["input_units"] == "M/S"
        [stage] = paz["stages"]
        assert stage["type"] == "A"
        assert stage["a0"] == pytest.approx(A0)
        assert stage["zeros"] == [0j, 0j]
        np.testing.assert_allclose(stage["poles"], POLES)

    def test_parse_requires_paz(self, tmp_path):
        # a RESP with no stages at all raises the stage-chain error; one
        # with only digital stages raises parse_resp_paz's own
        p = tmp_path / "RESP.nopaz"
        p.write_text(RESP_TEXT)
        with pytest.raises(ValueError, match="no invertible"):
            seismic.parse_resp_paz(str(p))
        p2 = tmp_path / "RESP.dig"
        p2.write_text(B061_TEXT)
        with pytest.raises(ValueError, match="pole-zero"):
            seismic.parse_resp_paz(str(p2))

    def test_evaluate_matches_analytic(self, resp_paz):
        freqs = np.asarray([0.01, 0.05, 0.2, 1.0, 4.0])
        h = seismic.evaluate_response(resp_paz, freqs, units="VEL")
        np.testing.assert_allclose(h, _analytic_response(freqs), rtol=1e-12)
        # DISP = VEL response x j*omega (V = j*omega*D)
        h_dis = seismic.evaluate_response(resp_paz, freqs, units="DISP")
        np.testing.assert_allclose(
            h_dis, _analytic_response(freqs) * 2j * np.pi * freqs,
            rtol=1e-12,
        )

    @staticmethod
    def _tukey(n, frac=0.25):
        """Cosine-tapered window: the planted ground motion must decay to
        zero at the record ends — an untapered tone zero-padded through
        the response creates a boundary step whose spike the record
        truncation drops, and the ~1/s^2 inversion turns that into a
        large low-frequency error (exactly why the real pipeline tapers
        before deconvolving)."""
        m = int(frac * n / 2)
        w = np.ones(n)
        ramp = 0.5 * (1 - np.cos(np.pi * np.arange(m) / m))
        w[:m] = ramp
        w[n - m:] = ramp[::-1]
        return w

    def test_roundtrip_recovers_input(self, resp_paz):
        """Synthetic ground velocity -> counts through the analytic
        response -> remove_response_native recovers the input (the
        VERDICT r3 'done' criterion for the native deconvolution)."""
        fs, n = 10.0, 4096
        t = np.arange(n) / fs
        x = (
            np.sin(2 * np.pi * 0.05 * t)
            + 0.5 * np.sin(2 * np.pi * 0.3 * t + 1.0)
            + 0.2 * np.sin(2 * np.pi * 1.5 * t + 2.0)
        ) * self._tukey(n)
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(x, nfft) * _analytic_response(freqs), nfft
        )[:n]

        band = (0.02, 0.04, 2.0, 4.0)
        rec = seismic.remove_response_native(
            counts, fs, resp_paz, units="VEL", water_level=120.0,
            taper_fraction=0.0, pre_filt=band,
        )
        # Compare through the same band limit: the record truncation
        # injects noise below ~0.02 Hz that 1/H amplifies (the response
        # has zeros at the origin), which is precisely what pre_filt
        # guards in the real pipeline. In-band, recovery is sharp.
        want = np.fft.irfft(
            np.fft.rfft(x, nfft) * seismic.cosine_sac_taper(freqs, band),
            nfft,
        )[:n]
        core = slice(n // 8, n - n // 8)
        err = np.abs(rec[core] - want[core]).max()
        assert err < 5e-3, f"roundtrip error {err:.2e}"

    def test_units_conversion_integrates(self, resp_paz):
        """Requesting DISP recovers the displacement (= integral of the
        planted velocity tone)."""
        fs, n, f0 = 10.0, 4096, 0.25
        t = np.arange(n) / fs
        w = self._tukey(n)
        vel = np.sin(2 * np.pi * f0 * t) * w
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(vel, nfft) * _analytic_response(freqs), nfft
        )[:n]
        band = (0.05, 0.1, 1.0, 2.0)
        rec = seismic.remove_response_native(
            counts, fs, resp_paz, units="DISP", water_level=120.0,
            taper_fraction=0.0, pre_filt=band,
        )
        # oracle: exact in-band displacement = spectral integral of the
        # planted velocity (a time-domain cumsum oracle carries a
        # half-sample phase lag that would dominate the comparison); the
        # extra 1/(j*omega) pushes near-DC bins under the water level, so
        # displacement is only recoverable in-band (the real pipeline
        # bandpasses for the same reason)
        integ = np.where(freqs > 0, 1.0, 0.0) / np.where(
            freqs > 0, 2j * np.pi * freqs, 1.0
        )
        want = np.fft.irfft(
            np.fft.rfft(vel, nfft) * integ
            * seismic.cosine_sac_taper(freqs, band),
            nfft,
        )[:n]
        core = slice(n // 8, n - n // 8)
        got = rec[core] - rec[core].mean()
        ref = want[core] - want[core].mean()
        assert np.abs(got - ref).max() < 5e-3

    def test_pre_filt_suppresses_out_of_band(self, resp_paz):
        fs, n = 10.0, 2048
        t = np.arange(n) / fs
        x = (
            np.sin(2 * np.pi * 0.2 * t) + np.sin(2 * np.pi * 4.0 * t)
        ) * self._tukey(n)
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(x, nfft) * _analytic_response(freqs), nfft
        )[:n]
        rec = seismic.remove_response_native(
            counts, fs, resp_paz, units="VEL", water_level=120.0,
            taper_fraction=0.0, pre_filt=(0.01, 0.05, 1.0, 2.0),
        )
        spec = np.abs(np.fft.rfft(rec))
        f = np.fft.rfftfreq(n, 1.0 / fs)
        in_band = spec[np.argmin(np.abs(f - 0.2))]
        out_band = spec[np.argmin(np.abs(f - 4.0))]
        assert out_band < in_band * 1e-3

    def test_remove_trace_prefers_native(self, resp_paz, tmp_path):
        """remove_trace uses the native path (no simulate call) when the
        RESP has pole-zero stages, and falls back to obspy simulate when
        it does not."""
        fs, n = 10.0, 512
        data = np.sin(2 * np.pi * 0.2 * np.arange(n) / fs)

        class Tr:
            def __init__(self):
                self.data = data.copy()
                self.stats = FakeStats(sampling_rate=fs)
                self.simulated = []

            def simulate(self, **kw):
                self.simulated.append(kw)

        tr = Tr()
        seismic.remove_trace(tr, resp_paz, units="VEL")
        assert not tr.simulated
        assert not np.allclose(tr.data, data)  # actually deconvolved

        nopaz = tmp_path / "RESP.nopaz"
        nopaz.write_text(RESP_TEXT)
        tr2 = Tr()
        seismic.remove_trace(tr2, str(nopaz), units="VEL")
        assert len(tr2.simulated) == 1  # fell back to obspy simulate

    def test_acc_units_finite(self, resp_paz):
        """Requesting ACC (unit-derivative k < 0: divide by j*omega) must
        not produce NaN at f=0 — a NaN there poisons the water-level
        gamma and returns an all-NaN trace (review r3)."""
        freqs = np.asarray([0.0, 0.1, 1.0])
        h = seismic.evaluate_response(resp_paz, freqs, units="ACC")
        assert np.isfinite(h).all()
        assert h[0] == 0
        np.testing.assert_allclose(
            h[1:], _analytic_response(freqs[1:]) / (2j * np.pi * freqs[1:]),
            rtol=1e-12,
        )
        fs, n = 10.0, 1024
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * 0.5 * t) * self._tukey(n)
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        fr = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(x, nfft) * _analytic_response(fr), nfft
        )[:n]
        rec = seismic.remove_response_native(
            counts, fs, resp_paz, units="ACC", taper_fraction=0.0,
        )
        assert np.isfinite(rec).all()

    def test_repeated_stage_without_epoch_header_rejected(self, tmp_path):
        """A repeated stage block WITHOUT its own epoch header (B050F03 +
        start date) is corruption, not a second epoch — it must be
        rejected, not silently merged into a product of both blocks'
        transfer functions (review r3)."""
        stage = "B053F03" + RESP_PAZ_TEXT.split("B053F03")[1]
        p = tmp_path / "RESP.two"
        p.write_text(RESP_PAZ_TEXT + stage)
        with pytest.raises(ValueError, match="repeats stage sequence"):
            seismic.parse_resp_paz(str(p))


# Epoch 2 of the multi-epoch fixture: same geometry/codes, a NEW start
# date (2017,001, open-ended) and a DOUBLED sensitivity — so epoch choice
# measurably changes the deconvolution (VERDICT r4 #3 'done' criterion).
RESP_EPOCH2_TEXT = (
    RESP_PAZ_TEXT
    .replace("Start date:  2014,001,00:00:00",
             "Start date:  2017,001,00:00:00")
    .replace("End date:    2016,366,23:59:59", "End date:    No Ending Time")
    .replace("Sensitivity:    5.24814E+08", "Sensitivity:    1.049628E+09")
)
MULTI_EPOCH_TEXT = RESP_PAZ_TEXT + RESP_EPOCH2_TEXT
T_EPOCH1 = datetime(2015, 6, 1)
T_EPOCH2 = datetime(2018, 6, 1)


class TestMultiEpochResp:
    """Native multi-epoch RESP handling (VERDICT r4 #3): rdseed appends
    one full response block per epoch; the reference selects by passing
    the trace date to the external evalresp binary
    (environment.py:434-441) — here `split_resp_epochs` + `when=` do the
    same selection natively."""

    @pytest.fixture
    def resp_two(self, tmp_path):
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(MULTI_EPOCH_TEXT)
        return str(p)

    def test_split_epochs(self, resp_two):
        epochs = seismic.split_resp_epochs(resp_two)
        assert len(epochs) == 2
        assert epochs[0]["t_start"] == datetime(2014, 1, 1)
        assert epochs[0]["t_end"] == datetime(2016, 12, 31, 23, 59, 59)
        assert epochs[1]["t_start"] == datetime(2017, 1, 1)
        assert epochs[1]["t_end"] is None  # 'No Ending Time'

    def test_parse_without_when_raises(self, resp_two):
        with pytest.raises(ValueError, match="response epochs"):
            seismic.parse_resp_stages(resp_two)

    def test_when_selects_epoch(self, resp_two):
        freqs = np.asarray([0.05, 0.2, 1.0])
        h1 = seismic.evaluate_response(
            resp_two, freqs, units="VEL", when=T_EPOCH1
        )
        h2 = seismic.evaluate_response(
            resp_two, freqs, units="VEL", when=T_EPOCH2
        )
        np.testing.assert_allclose(h1, _analytic_response(freqs), rtol=1e-12)
        # epoch 2 doubled the sensitivity — epoch choice changes the answer
        np.testing.assert_allclose(h2, 2.0 * h1, rtol=1e-12)

    def test_when_outside_all_epochs_raises(self, resp_two):
        with pytest.raises(ValueError, match="no response epoch covers"):
            seismic.parse_resp_stages(resp_two, when=datetime(2010, 1, 1))

    def test_when_accepts_duck_typed_times(self, resp_two):
        import pandas as pd

        h_dt = seismic.evaluate_response(
            resp_two, [0.2], units="VEL", when=T_EPOCH2
        )
        for alt in (pd.Timestamp(T_EPOCH2), T_EPOCH2.isoformat()):
            np.testing.assert_allclose(
                seismic.evaluate_response(
                    resp_two, [0.2], units="VEL", when=alt
                ),
                h_dt,
            )

    def test_metadata_epoch_selection(self, resp_two):
        info0 = seismic.read_resp_metadata(resp_two)  # matching default
        assert info0["n_epochs"] == 2
        assert info0["t_start"] == datetime(2014, 1, 1)
        assert info0["station"] == "KPDR"
        info2 = seismic.read_resp_metadata(resp_two, when=T_EPOCH2)
        assert info2["t_start"] == datetime(2017, 1, 1)
        assert info2["sensitivity"] == pytest.approx(2 * SENS)

    def test_find_resp_file_handles_multi_epoch(self, resp_two):
        stats = FakeStats(
            network="KP", station="KPDR", location="", channel="HDH"
        )
        assert seismic.find_resp_file(stats, [resp_two]) == resp_two

    def test_roundtrip_per_epoch(self, resp_two):
        """Numeric roundtrip where the epoch choice changes the answer:
        counts synthesized through epoch 2's response deconvolve back to
        the input with when=epoch-2 time; deconvolving the same counts
        against epoch 1 overshoots by exactly the sensitivity ratio."""
        fs, n = 10.0, 4096
        t = np.arange(n) / fs
        tuk = TestNativeDeconvolution._tukey(n)
        x = (
            np.sin(2 * np.pi * 0.05 * t)
            + 0.5 * np.sin(2 * np.pi * 0.3 * t + 1.0)
        ) * tuk
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(x, nfft) * 2.0 * _analytic_response(freqs), nfft
        )[:n]
        band = (0.02, 0.04, 2.0, 4.0)
        rec2 = seismic.remove_response_native(
            counts, fs, resp_two, units="VEL", water_level=120.0,
            taper_fraction=0.0, pre_filt=band, when=T_EPOCH2,
        )
        rec1 = seismic.remove_response_native(
            counts, fs, resp_two, units="VEL", water_level=120.0,
            taper_fraction=0.0, pre_filt=band, when=T_EPOCH1,
        )
        # in-band recovery against the band-limited reference signal
        spec_band = np.fft.rfft(x, nfft) * seismic.cosine_sac_taper(
            freqs, band
        )
        x_band = np.fft.irfft(spec_band, nfft)[:n]
        core = slice(n // 8, -n // 8)
        np.testing.assert_allclose(
            rec2[core], x_band[core], atol=5e-3 * np.abs(x_band).max()
        )
        # wrong epoch = wrong sensitivity: off by exactly 2x
        np.testing.assert_allclose(rec1, 2.0 * rec2, rtol=1e-10)

    def test_remove_trace_selects_epoch_natively(self, resp_two):
        """remove_trace resolves the epoch from the trace's start time —
        NO obspy fallback (this was the one reference-reachable input the
        framework could not process at all, VERDICT r3 missing #1)."""
        fs, n = 10.0, 512
        data = np.sin(2 * np.pi * 0.2 * np.arange(n) / fs)

        class Tr:
            def __init__(self, t0):
                self.data = data.copy()
                self.stats = FakeStats(sampling_rate=fs, starttime=t0)
                self.simulated = []

            def simulate(self, **kw):
                self.simulated.append(kw)

        tr1, tr2 = Tr(T_EPOCH1), Tr(T_EPOCH2)
        seismic.remove_trace(tr1, resp_two, units="VEL")
        seismic.remove_trace(tr2, resp_two, units="VEL")
        assert not tr1.simulated and not tr2.simulated  # stayed native
        assert not np.allclose(tr1.data, data)
        # doubled epoch-2 sensitivity -> half the recovered amplitude
        np.testing.assert_allclose(tr1.data, 2.0 * tr2.data, rtol=1e-10)


# ---------------------------------------------------------------------------
# digital (FIR/IIR coefficient) stages: blockettes 054/061/057. The
# reference covers these via the external evalresp binary
# (environment.py:413-455); here they evaluate natively.

FIR_STAGE2_TEXT = """\
B054F03     Transfer function type:                D
B054F04     Stage sequence number:                 2
B054F05     Response in units lookup:              V - Volts
B054F06     Response out units lookup:             COUNTS - Digital Counts
B054F07     Number of numerators:                  3
B054F10     Number of denominators:                0
B054F08-09     0  +2.50000E-01  +0.00000E+00
B054F08-09     1  +5.00000E-01  +0.00000E+00
B054F08-09     2  +2.50000E-01  +0.00000E+00
B057F03     Stage sequence number:                 2
B057F04     Input sample rate (HZ):                200.0
B057F05     Decimation factor:                     1
B057F06     Decimation offset:                     0
B057F07     Estimated delay (seconds):             +5.00000E-03
B057F08     Correction applied (seconds):          +5.00000E-03
"""

RESP_PAZ_FIR_TEXT = RESP_PAZ_TEXT + FIR_STAGE2_TEXT

B061_TEXT = RESP_TEXT + """\
B061F03     Stage sequence number:                 1
B061F04     Response Name:                         FIR_TEST
B061F05     Symmetry Code:                         C
B061F06     Signal In Units:                       M/S - Velocity
B061F07     Signal Out Units:                      COUNTS - Digital Counts
B061F08     Number of Coefficients:                2
B061F09     0  +2.50000E-01
B061F09     1  +2.50000E-01
B057F03     Stage sequence number:                 1
B057F04     Input sample rate (HZ):                200.0
B057F05     Decimation factor:                     1
"""


def _fir_raised_cosine(freqs, fs=200.0):
    """Oracle for FIR_STAGE2_TEXT: [.25, .5, .25] at fs with the applied
    1-sample delay correction undone = zero-phase raised cosine."""
    return 0.5 + 0.5 * np.cos(2 * np.pi * np.asarray(freqs) / fs)


class TestDigitalStages:
    @pytest.fixture
    def resp_paz_fir(self, tmp_path):
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(RESP_PAZ_FIR_TEXT)
        return str(p)

    def test_parse_digital_stages(self, resp_paz_fir):
        full = seismic.parse_resp_stages(resp_paz_fir)
        assert len(full["paz_stages"]) == 1
        [d] = full["digital_stages"]
        assert d["numerator"] == [0.25, 0.5, 0.25]
        assert d["denominator"] == []
        assert d["symmetry"] == "A"
        assert d["input_rate"] == pytest.approx(200.0)
        assert d["correction"] == pytest.approx(5.0e-3)
        assert full["sensitivity"] == pytest.approx(SENS)
        assert full["input_units"] == "M/S"

    def test_fir_stage_matches_analytic(self, resp_paz_fir):
        """PAZ x FIR chain == analytic PAZ x zero-phase raised cosine
        (the B057 correction undoes the FIR's linear phase)."""
        freqs = np.asarray([0.01, 0.05, 0.2, 1.0, 4.0])
        h = seismic.evaluate_response(resp_paz_fir, freqs, units="VEL")
        want = _analytic_response(freqs) * _fir_raised_cosine(freqs)
        np.testing.assert_allclose(h, want, rtol=1e-12)

    def test_b061_symmetric_zero_phase(self, tmp_path):
        """A symmetric (code C) B061 FIR evaluates zero-phase: listed
        half [.25, .25] expands to [.25 x4], linear phase removed ->
        0.5*(cos(1.5w) + cos(0.5w)), purely real."""
        p = tmp_path / "RESP.sym"
        p.write_text(B061_TEXT)
        freqs = np.asarray([0.0, 1.0, 10.0, 40.0])
        h = seismic.evaluate_response(str(p), freqs, units="VEL")
        w = 2 * np.pi * freqs / 200.0
        want = SENS * 0.5 * (np.cos(1.5 * w) + np.cos(0.5 * w))
        np.testing.assert_allclose(h.imag, 0.0, atol=abs(SENS) * 1e-12)
        np.testing.assert_allclose(h.real, want, rtol=1e-12)

    def test_symmetry_b_expansion(self, tmp_path):
        """Symmetry B (odd total, center listed last): [.2, .6] ->
        [.2, .6, .2] -> zero-phase .6 + .4*cos(w)."""
        txt = B061_TEXT.replace(
            "Symmetry Code:                         C",
            "Symmetry Code:                         B",
        ).replace("+2.50000E-01\nB061F09     1  +2.50000E-01",
                  "+2.00000E-01\nB061F09     1  +6.00000E-01")
        p = tmp_path / "RESP.symb"
        p.write_text(txt)
        freqs = np.asarray([0.0, 5.0, 25.0])
        h = seismic.evaluate_response(str(p), freqs, units="VEL")
        w = 2 * np.pi * freqs / 200.0
        np.testing.assert_allclose(
            h.real, SENS * (0.6 + 0.4 * np.cos(w)), rtol=1e-12
        )

    def test_fir_normalized_to_unit_dc(self, tmp_path):
        """FIR coefficients not summing to 1 are normalized to unit DC
        gain (evalresp convention: stage gain lives in the B058
        sensitivity)."""
        txt = RESP_PAZ_FIR_TEXT.replace("+5.00000E-01", "+1.50000E+00")
        p = tmp_path / "RESP.unnorm"
        p.write_text(txt)
        h0 = seismic.evaluate_response(str(p), np.asarray([1e-6]),
                                       units="VEL")
        ref = seismic.evaluate_response(p_write(p, RESP_PAZ_TEXT),
                                        np.asarray([1e-6]), units="VEL")
        # at ~DC the normalized FIR contributes exactly 1
        np.testing.assert_allclose(h0, ref, rtol=1e-9)

    def test_digital_only_resp_is_native(self, tmp_path):
        """A coefficient-only RESP (no B053) now deconvolves natively —
        remove_trace must NOT fall back to obspy simulate."""
        p = tmp_path / "RESP.dig"
        p.write_text(B061_TEXT)
        fs, n = 10.0, 512
        data = np.sin(2 * np.pi * 0.2 * np.arange(n) / fs)

        class Tr:
            def __init__(self):
                self.data = data.copy()
                self.stats = FakeStats(sampling_rate=fs)
                self.simulated = []

            def simulate(self, **kw):
                self.simulated.append(kw)

        tr = Tr()
        seismic.remove_trace(tr, str(p), units="VEL")
        assert not tr.simulated
        assert not np.allclose(tr.data, data)

    def test_roundtrip_through_fir_chain(self, resp_paz_fir):
        """Synthetic velocity -> counts through PAZ x FIR ->
        remove_response_native recovers the input in band."""
        fs, n = 10.0, 4096
        t = np.arange(n) / fs
        x = (
            np.sin(2 * np.pi * 0.05 * t)
            + 0.5 * np.sin(2 * np.pi * 0.3 * t + 1.0)
            + 0.2 * np.sin(2 * np.pi * 1.5 * t + 2.0)
        ) * TestNativeDeconvolution._tukey(n)
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        counts = np.fft.irfft(
            np.fft.rfft(x, nfft)
            * _analytic_response(freqs) * _fir_raised_cosine(freqs),
            nfft,
        )[:n]
        band = (0.02, 0.04, 2.0, 4.0)
        rec = seismic.remove_response_native(
            counts, fs, resp_paz_fir, units="VEL", water_level=120.0,
            taper_fraction=0.0, pre_filt=band,
        )
        want = np.fft.irfft(
            np.fft.rfft(x, nfft) * seismic.cosine_sac_taper(freqs, band),
            nfft,
        )[:n]
        core = slice(n // 8, n - n // 8)
        err = np.abs(rec[core] - want[core]).max()
        assert err < 5e-3, f"roundtrip error {err:.2e}"

    def test_hybrid_poly_paz_rejected(self, tmp_path):
        """A RESP mixing a polynomial (B062) stage with pole-zero stages
        is invertible by NEITHER spectral division nor sample-wise
        polynomial conversion -> loud ValueError (obspy fallback)."""
        p = tmp_path / "RESP.hybrid"
        p.write_text(RESP_PAZ_TEXT + POLY_BLOCKETTE)
        with pytest.raises(ValueError, match="hybrid"):
            seismic.remove_response_native(np.ones(32), 10.0, str(p))

    def test_digital_stage_requires_rate(self, tmp_path):
        """A coefficient stage without a B057 input sample rate cannot be
        evaluated (frequency axis undefined) -> loud ValueError (which
        remove_trace turns into the obspy fallback)."""
        txt = RESP_PAZ_TEXT + FIR_STAGE2_TEXT.split("B057F03")[0]
        p = tmp_path / "RESP.norate"
        p.write_text(txt)
        with pytest.raises(ValueError, match="sample rate"):
            seismic.evaluate_response(str(p), np.asarray([1.0]))

    def test_analog_coefficient_b054_falls_back(self, tmp_path):
        """B054 stages with analog transfer types (A/B, evalresp's
        analog_trans) are NOT digital filters; evaluating them as
        z-transforms would be silently wrong — the native path refuses
        and remove_trace falls back to obspy (review r3)."""
        txt = RESP_PAZ_FIR_TEXT.replace(
            "B054F03     Transfer function type:                D",
            "B054F03     Transfer function type:                A",
        )
        p = tmp_path / "RESP.analogco"
        p.write_text(txt)
        with pytest.raises(ValueError, match="analog-coefficient"):
            seismic.evaluate_response(str(p), np.asarray([1.0]))

        class Tr:
            data = np.ones(64)
            stats = FakeStats(sampling_rate=10.0)

            def __init__(self):
                self.simulated = []

            def simulate(self, **kw):
                self.simulated.append(kw)

        tr = Tr()
        seismic.remove_trace(tr, str(p), units="VEL")
        assert len(tr.simulated) == 1

    def test_iir_stage_no_delay_correction(self, tmp_path):
        """IIR (denominator-bearing) stages take no B057F08 delay
        correction — evalresp applies it to asymmetric FIR only
        (review r3). Oracle: H = num(z)/den(z) exactly, un-normalized."""
        txt = RESP_PAZ_FIR_TEXT.replace(
            "B054F10     Number of denominators:                0",
            "B054F10     Number of denominators:                2\n"
            "B054F11-12     0  +1.00000E+00  +0.00000E+00\n"
            "B054F11-12     1  -5.00000E-01  +0.00000E+00",
        )
        p = tmp_path / "RESP.iir"
        p.write_text(txt)
        freqs = np.asarray([0.5, 2.0, 10.0])
        h = seismic.evaluate_response(str(p), freqs, units="VEL")
        z = np.exp(-1j * 2 * np.pi * freqs / 200.0)
        num = 0.25 + 0.5 * z + 0.25 * z * z
        den = 1.0 - 0.5 * z
        want = _analytic_response(freqs) * num / den  # no exp(+jwc) term
        np.testing.assert_allclose(h, want, rtol=1e-12)

    def test_repeated_digital_stage_rejected(self, tmp_path):
        # duplicated FIR block without its own epoch header = corrupt
        p = tmp_path / "RESP.twofir"
        p.write_text(RESP_PAZ_FIR_TEXT + FIR_STAGE2_TEXT)
        with pytest.raises(ValueError, match="repeats stage sequence"):
            seismic.parse_resp_stages(str(p))

    def test_compute_response_native_backend(self, tmp_path, monkeypatch):
        """Without the evalresp binary (this image), compute_response
        writes the same AMP./PHASE. two-column files natively, readable
        by read_response_function and matching the analytic oracle."""
        monkeypatch.chdir(tmp_path)
        p = tmp_path / "RESP.KP.KPDR..HDH"
        p.write_text(RESP_PAZ_FIR_TEXT)
        # auto == native here: no evalresp on PATH
        info, amp_file, phase_file = seismic.compute_response(
            str(p), 0.01, 1.0, 40
        )
        assert info["station"] == "KPDR"
        assert amp_file == "AMP.KP.KPDR..HDH"
        f, amp = seismic.read_response_function(amp_file)
        assert len(f) == 40
        assert f[0] == pytest.approx(0.01, rel=1e-5)
        assert f[-1] == pytest.approx(1.0, rel=1e-5)
        want = np.abs(
            _analytic_response(f) * _fir_raised_cosine(f)
        )
        np.testing.assert_allclose(amp, want, rtol=1e-5)
        fp, ph = seismic.read_response_function(phase_file)
        np.testing.assert_allclose(
            np.radians(ph),
            np.angle(_analytic_response(f) * _fir_raised_cosine(f)),
            atol=1e-5,
        )
        with pytest.raises(FileNotFoundError):
            seismic.compute_response(str(p), 0.01, 1.0, 4,
                                     backend="evalresp")
        with pytest.raises(ValueError, match="unknown backend"):
            seismic.compute_response(str(p), 0.01, 1.0, 4, backend="x")

    def test_analog_b057_does_not_leak(self, tmp_path):
        """A B057 for a stage WITHOUT a coefficient blockette (analog
        stages carry decimation info too in real files) must not attach
        its rate/correction to an earlier digital stage."""
        txt = (
            RESP_PAZ_FIR_TEXT
            + "B057F03     Stage sequence number:                 1\n"
            + "B057F04     Input sample rate (HZ):                999.0\n"
        )
        p = tmp_path / "RESP.leak"
        p.write_text(txt)
        [d] = seismic.parse_resp_stages(str(p))["digital_stages"]
        assert d["input_rate"] == pytest.approx(200.0)


def p_write(path, text):
    """Write text next to `path` and return the new file's path (helper
    for comparing against a PAZ-only variant of the same RESP)."""
    q = str(path) + ".ref"
    with open(q, "w") as fh:
        fh.write(text)
    return q


# ---------------------------------------------------------------------------
# polynomial (B062) responses: sample-wise MacLaurin conversion — the one
# response family neither evalresp spectral division (reference
# environment.py:434-441) nor obspy remove_response/simulate can handle

POLY_BLOCKETTE = """\
B062F03     Transfer function type:                P [Polynomial]
B062F04     Stage sequence number:                 1
B062F05     Response in units lookup:              C - Temperature in Degrees Celsius
B062F06     Response out units lookup:             COUNTS - Digital Counts
B062F07     Polynomial Approximation Type:         M [MacLaurin]
B062F08     Valid Frequency Units:                 B [Hz]
B062F09     Lower Valid Frequency Bound:           0.000000E+00
B062F10     Upper Valid Frequency Bound:           1.000000E+01
B062F14     Number of coefficients:                3
B062F15-16     0  +2.00000E+00  +0.00000E+00
B062F15-16     1  +5.00000E-01  +0.00000E+00
B062F15-16     2  +1.00000E-03  +0.00000E+00
"""

POLY_RESP_TEXT = """\
B050F03     Station:     KPTM
B050F16     Network:     KP
B052F03     Location:    ??
B052F04     Channel:     LKO
B052F22     Start date:  2014,001,00:00:00
B052F23     End date:    2016,366,23:59:59
""" + POLY_BLOCKETTE


class TestPolynomialResponse:
    @pytest.fixture
    def resp_poly(self, tmp_path):
        p = tmp_path / "RESP.KP.KPTM..LKO"
        p.write_text(POLY_RESP_TEXT)
        return str(p)

    def test_parse_polynomial_stage(self, resp_poly):
        parsed = seismic.parse_resp_stages(resp_poly)
        assert parsed["paz_stages"] == []
        assert parsed["digital_stages"] == []
        [stage] = parsed["poly_stages"]
        assert stage["approximation"] == "M"
        assert stage["input_units"] == "C"
        assert stage["coefficients"] == pytest.approx([2.0, 0.5, 1e-3])
        # polynomial RESPs need no B058 sensitivity: the coefficients
        # already map counts to physical units
        assert parsed["sensitivity"] is None

    def test_conversion_is_exact_maclaurin(self, resp_poly):
        counts = np.asarray([-100.0, 0.0, 1.0, 50.0, 1000.0])
        got = seismic.remove_response_native(counts, 1.0, resp_poly)
        want = 2.0 + 0.5 * counts + 1e-3 * counts**2
        # Horner vs naive power-sum order differ only in the last ulp
        np.testing.assert_allclose(got, want, rtol=1e-14)

    def test_remove_trace_native_polynomial(self, resp_poly):
        """remove_trace handles B062 natively — it must NOT fall back to
        obspy, whose evalresp bindings cannot process polynomials."""

        class Tr:
            data = np.arange(16.0)
            stats = FakeStats(sampling_rate=1.0)

            def __init__(self):
                self.simulated = []

            def simulate(self, **kw):
                self.simulated.append(kw)

        tr = Tr()
        seismic.remove_trace(tr, resp_poly)
        assert tr.simulated == []
        np.testing.assert_allclose(
            tr.data, 2.0 + 0.5 * np.arange(16.0) + 1e-3 * np.arange(16.0) ** 2
        )

    def test_evaluate_response_rejects_polynomial(self, resp_poly):
        with pytest.raises(ValueError, match="frequency-domain"):
            seismic.evaluate_response(resp_poly, np.asarray([1.0]))

    def test_non_maclaurin_rejected(self, tmp_path):
        p = tmp_path / "RESP.polyA"
        p.write_text(POLY_RESP_TEXT.replace("M [MacLaurin]", "A [Other]"))
        with pytest.raises(ValueError, match="approximation"):
            seismic.remove_response_native(np.ones(8), 1.0, str(p))

    def test_repeated_polynomial_stage_rejected(self, tmp_path):
        # duplicated B062 block without its own epoch header = corrupt
        p = tmp_path / "RESP.polytwice"
        p.write_text(POLY_RESP_TEXT + POLY_BLOCKETTE)
        with pytest.raises(ValueError, match="repeats stage sequence"):
            seismic.parse_resp_stages(str(p))

    def test_truncated_coefficient_tail_rejected(self, tmp_path):
        """A missing TAIL row keeps indices contiguous-from-0, so only the
        declared B062F14 count can catch it — silently dropping the
        highest-order term would return wrong physical values."""
        p = tmp_path / "RESP.polytrunc"
        p.write_text(POLY_RESP_TEXT.replace(
            "B062F15-16     2  +1.00000E-03  +0.00000E+00\n", ""
        ))
        with pytest.raises(ValueError, match="truncated"):
            seismic.parse_resp_stages(str(p))

    def test_gapped_coefficients_rejected(self, tmp_path):
        p = tmp_path / "RESP.polygap"
        p.write_text(POLY_RESP_TEXT.replace(
            "B062F15-16     1  +5.00000E-01  +0.00000E+00\n", ""
        ))
        with pytest.raises(ValueError, match="contiguous"):
            seismic.parse_resp_stages(str(p))
