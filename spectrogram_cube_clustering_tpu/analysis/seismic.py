"""Seismic preprocessing: SAC -> MSEED conversion and response removal.

Parity target: `KPDR_sac2mseed` + the response-removal helpers
(Cluster/environment.py:167-521): daily windows with taper/pre-feed
buffers, detrend -> hann taper -> zero-phase 0.4 Hz lowpass -> decimate
x100 -> optional instrument-response removal -> 0.001-0.04 Hz bandpass,
written as day-long MSEED files.

obspy does not ship in this image; every entry point lazily imports it and
raises a clear error when absent (the reference additionally shells out to
an external `evalresp` binary, environment.py:434-441 — here response
removal uses obspy's built-in evalresp bindings instead of a subprocess).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta
from typing import Optional


def _obspy():
    try:
        import obspy

        return obspy
    except ImportError as e:
        raise ImportError(
            "seismic preprocessing requires obspy (not installed in this "
            "environment); install obspy to use analysis.seismic"
        ) from e


def file2dt(fname: str) -> datetime:
    """SAC filename 'YYYY.JJJ.HH.MM.SS.*' -> datetime
    (environment.py:149-155)."""
    parts = fname.split(".")[0:5]
    return datetime.strptime(" ".join(parts), "%Y %j %H %M %S")


def sac2mseed(
    datadir: str = ".",
    destdir: str = ".",
    response: bool = False,
    station_pattern: str = "HDH",
    taper_trace: int = 10,
    pre_feed: int = 20,
    decimation: int = 100,
    lowpass_hz: float = 0.4,
    band: tuple = (0.001, 0.04),
    resp_file: Optional[str] = None,
) -> list:
    """Convert daily SAC files to preprocessed MSEED (environment.py:167-250).

    Returns the list of written file paths.
    """
    obspy = _obspy()
    import pandas as pd

    files = sorted(
        f for f in os.listdir(datadir)
        if station_pattern in f and "SAC" in f
    )
    if len(files) < 3:
        raise ValueError("Not enough SAC files for continuous conversion.")
    if response and resp_file is None:
        resp = [f for f in os.listdir(datadir) if "RESP" in f]
        if not resp:
            raise FileNotFoundError("No RESP files found in datadir.")
        resp_file = os.path.join(datadir, resp[0])

    os.makedirs(destdir, exist_ok=True)
    dti = pd.date_range(file2dt(files[0]).date(), file2dt(files[-1]).date(), freq="D")
    buffer_front = taper_trace + pre_feed
    buffer_back = taper_trace
    written = []

    for d in range(1, len(dti) - 1):
        t0, t1 = dti[d], dti[d + 1]
        time_start = t0 - timedelta(minutes=buffer_front)
        time_stop = t1 + timedelta(minutes=buffer_back)
        search_days = pd.date_range(
            time_start.floor("D"), time_stop.ceil("D"), freq="D"
        )
        flist = [f for f in files if file2dt(f).date() in search_days[:-1].date]
        if not flist:
            continue
        st = None
        for fname in flist:
            part = obspy.read(os.path.join(datadir, fname))
            st = part if st is None else st + part
        st.merge(method=1, fill_value="interpolate", interpolation_samples=5)
        tr = st[0].trim(
            starttime=obspy.UTCDateTime(time_start),
            endtime=obspy.UTCDateTime(time_stop),
        )
        tr.detrend(type="linear")
        tr.taper(max_percentage=0.5, type="hann", max_length=60 * taper_trace)
        try:
            tr.filter("lowpass", freq=lowpass_hz, corners=2, zerophase=True)
        except ValueError as e:
            raise ValueError("Check source files; missing data likely.") from e
        tr.decimate(decimation, no_filter=True)
        if response:
            remove_response(
                tr, resp_file, units="DISP",
                pre_filt=(0.0015, 0.003, 0.5, 0.6),
            )
        tr.filter("bandpass", freqmin=band[0], freqmax=band[1], zerophase=True)
        tr.trim(
            starttime=obspy.UTCDateTime(t0), endtime=obspy.UTCDateTime(t1)
        )
        dest = os.path.join(
            destdir,
            f"KP.KPDR..HDH__{t0.strftime('%Y%m%dT%H%M%SZ')}__"
            f"{t1.strftime('%Y%m%dT%H%M%SZ')}.mseed",
        )
        tr.write(dest, format="MSEED")
        written.append(dest)
    return written


def remove_response(
    trace, resp_file: str, units: str = "DISP", pre_filt: tuple = None
) -> None:
    """Instrument-response removal via obspy + RESP file, in place.

    The reference invokes an external `evalresp` executable and hand-rolls
    the deconvolution (environment.py:262-521, after Zhao Chen); obspy's
    `simulate(seedresp=...)` wraps the same evalresp computation natively.
    """
    _obspy()
    seedresp = {"filename": resp_file, "units": units}
    trace.simulate(
        paz_remove=None, pre_filt=pre_filt, seedresp=seedresp, sacsim=True
    )
