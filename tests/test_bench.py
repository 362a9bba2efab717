"""Bench entry-point bitrot guards (tiny sizes, CPU)."""

import sys


def test_measure_aec_throughput_runs():
    sys.path.insert(0, "/root/repo")
    from bench import measure_aec_throughput

    import numpy as np

    tput, loss = measure_aec_throughput(256, 64, epochs=1)
    assert tput > 0
    assert np.isfinite(loss)


def test_measure_dec_throughput_runs():
    sys.path.insert(0, "/root/repo")
    from bench import measure_dec_throughput

    import numpy as np

    tput, loss = measure_dec_throughput(256, 64, epochs=1)
    assert tput > 0
    assert np.isfinite(loss)


def test_measure_stft_throughput_runs():
    sys.path.insert(0, "/root/repo")
    from bench import measure_stft_throughput

    tput, v = measure_stft_throughput(n_wave_samples=20_000, reps=2)
    assert tput > 0
