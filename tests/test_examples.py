"""Executable-documentation guard: examples/serving.py runs end-to-end.

(quickstart.py and distributed.py cover the same workflow/sharding code
paths the workflow and sharding suites already pin, and take minutes on
CPU; the serving tour is the one example whose composition — predictor +
HTTP + both waveform routes — isn't otherwise executed as a script.)
"""

import os
import runpy
import sys


def test_serving_example_runs(capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "serving.py",
    )
    argv, sys.argv = sys.argv, ["serving.py"]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "NMI vs planted" in out
    assert "labels match direct: True" in out
    assert "fused" in out
