"""Bench entry-point bitrot guards (tiny sizes, CPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_aec_throughput_runs():
    from bench import measure_aec_throughput

    import numpy as np

    tput, loss, spread = measure_aec_throughput(256, 64, epochs=1, reps=2)
    assert tput > 0
    assert np.isfinite(loss)
    assert spread["reps"] == 2 and spread["min"] <= tput <= spread["max"]


def test_measure_aec_packed_throughput_runs():
    from bench import measure_aec_throughput

    import numpy as np

    tput, loss, spread = measure_aec_throughput(
        256, 64, epochs=1, fused=True, packed=True
    )
    assert tput > 0
    assert np.isfinite(loss)


def test_measure_dec_throughput_runs():
    from bench import measure_dec_throughput

    import numpy as np

    tput, loss, spread = measure_dec_throughput(256, 64, epochs=1)
    assert tput > 0
    assert np.isfinite(loss)
    assert spread["reps"] == 1


def test_measure_stft_throughput_runs():
    from bench import measure_stft_throughput

    tput, v, spread = measure_stft_throughput(
        n_wave_samples=20_000, chain_len=2, reps=2
    )
    assert tput > 0
    assert spread["reps"] == 2


def test_measure_stream_throughput_runs():
    from bench import measure_stream_throughput

    import numpy as np

    tput, loss, spread = measure_stream_throughput(1024, 256, epochs=1)
    assert tput > 0
    assert np.isfinite(loss)
    assert spread["reps"] == 1


def test_measure_wire_rate_runs():
    from bench import measure_wire_rate

    rate = measure_wire_rate(mbytes=0.5, reps=2)
    assert rate > 0


def test_measure_stream_int8_runs():
    from bench import measure_stream_throughput

    import numpy as np

    tput, loss, spread = measure_stream_throughput(
        1024, 256, epochs=1, transfer_dtype="int8"
    )
    assert tput > 0
    assert np.isfinite(loss)


def test_stream_deadline_stops_reps():
    import time

    from bench import measure_stream_throughput

    # a deadline already in the past: the rep/epoch loops must still
    # complete >= 1 epoch and return, instead of running all reps
    t0 = time.perf_counter()
    tput, loss, spread = measure_stream_throughput(
        1024, 256, epochs=8, reps=5, deadline=time.perf_counter() - 1.0
    )
    assert tput > 0
    assert spread["reps"] == 1  # stopped after the first rep


def test_kill_mid_bench_leaves_metric_line(tmp_path):
    """VERDICT r4 #1 'done' criterion: a bench run killed mid-table
    (driver timeout = SIGKILL) must still leave >= 1 complete,
    parseable driver-schema JSON line on stdout — the BENCH_r03 failure
    mode (one deferred print at the end) memorialized nothing."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    out_path = tmp_path / "bench_out.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            [
                sys.executable, "bench.py", "--quick", "--samples", "512",
                "--batch", "128", "--reps", "1", "--metric", "all",
            ],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=out, stderr=subprocess.DEVNULL, env=env,
        )
        # wait for the FIRST metric line, then SIGKILL mid-run
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill it — also fine
            if out_path.exists() and out_path.read_text().strip():
                break
            time.sleep(0.5)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
    lines = [
        ln for ln in out_path.read_text().splitlines() if ln.strip()
    ]
    assert lines, "no output line survived the kill"
    row = json.loads(lines[-1])
    assert row["metric"] and row["value"] > 0
    assert row["unit"] == "samples/sec"


def test_watchdog_emits_when_metric_wedges(tmp_path):
    """A metric wedged INSIDE a tunnel RPC never returns control to the
    budget's between-metrics skip logic (observed on the real chip in
    round 4: a default run made zero progress for >15 min). The watchdog
    thread must hard-emit a driver-parseable line and exit on its own —
    no external kill."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # budget 1 s + 8 s margin: the first metric (which ignores the budget
    # by design — one metric always runs) takes longer than that on CPU,
    # standing in for a wedged RPC
    env["BENCH_WATCHDOG_MARGIN"] = "8"
    proc = subprocess.run(
        [
            sys.executable, "bench.py", "--quick", "--samples", "4096",
            "--batch", "256", "--reps", "3", "--metric", "all",
            "--budget", "1",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=240, env=env,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "watchdog left no output line"
    row = json.loads(lines[-1])
    assert row["unit"] == "samples/sec"
    # either the watchdog fired mid-metric (metric none, rc 1) or the
    # machine was fast enough that a metric completed first (rc 0 with a
    # real value) — both leave the driver a parseable line
    if row["metric"] == "none":
        assert row.get("aborted") == "watchdog"
        assert proc.returncode == 1
    else:
        assert row["value"] > 0


def test_rep_stats_rejects_stall_outliers():
    """VERDICT r4 weak #4: a single tunnel-stalled rep (rate far below
    the median) must not blow the reported spread — it is excluded from
    min/max/spread and counted in stalled_reps."""
    from bench import _rep_stats

    med, stats = _rep_stats([17.0, 18.0, 17.5, 1.4, 21.5])
    assert med == 17.75  # median of the 4 kept reps
    assert stats["stalled_reps"] == 1
    assert stats["min"] == 17.0 and stats["max"] == 21.5
    assert stats["spread_pct"] < 30.0
    assert stats["reps"] == 5

    # no stall: identical to the plain stats, no stalled_reps key
    med, stats = _rep_stats([10.0, 11.0, 12.0])
    assert med == 11.0
    assert "stalled_reps" not in stats
    assert stats["min"] == 10.0 and stats["max"] == 12.0

    # all-identical degenerate case stays sane
    med, stats = _rep_stats([5.0])
    assert med == 5.0 and stats["reps"] == 1


def test_emit_carries_wire_normalized_stream_rate(capsys):
    """VERDICT r4 next #7: stream rows carry samples_per_mbyte (rate
    divided by the day's measured wire rate) so tunnel swings cancel
    across rounds."""
    import json

    from bench import _emit

    results = {
        "aec": {"metric": "aec_train_samples_per_sec", "value": 100.0,
                "reps": 1, "min": 100.0, "max": 100.0, "spread_pct": 0.0},
        "stream": {"metric": "stream_train_samples_per_sec",
                   "value": 40000.0, "reps": 1, "min": 40000.0,
                   "max": 40000.0, "spread_pct": 0.0},
    }
    _emit(["aec", "stream"], results, baseline={}, wire=50.0)
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["extras"]["stream"]["samples_per_mbyte"] == 800.0
    assert "samples_per_mbyte" not in row  # headline (aec) unnormalized
    assert row["wire_mbytes_per_sec"] == 50.0


def test_emit_head_row_carries_normalization_and_stalls(capsys):
    """A single-metric stream run's HEAD row must carry samples_per_mbyte
    (and stalled_reps when present) — not only the extras rows."""
    import json

    from bench import _emit

    results = {
        "stream_int8": {"metric": "stream_int8_train_samples_per_sec",
                        "value": 50000.0, "reps": 3, "min": 40000.0,
                        "max": 60000.0, "spread_pct": 40.0,
                        "stalled_reps": 1},
    }
    _emit(["stream_int8"], results, baseline={}, wire=20.0)
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["samples_per_mbyte"] == 2500.0
    assert row["spread"]["stalled_reps"] == 1
