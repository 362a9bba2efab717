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
