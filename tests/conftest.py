"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 the sharded
paths are validated on `--xla_force_host_platform_device_count=8`.

NOTE: this image's sitecustomize force-registers the axon TPU plugin and
overrides JAX_PLATFORMS, so env vars alone are not enough — the platform
must be pinned via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

#: per-test wall-clock cap. pytest-timeout is not installed in this
#: image; a SIGALRM watchdog turns a wedged test (a stuck multiprocess
#: coordinator, a deadlocked queue) into a FAILURE instead of hanging
#: the whole suite forever. Override per test with
#: @pytest.mark.timeout_sec(N).
DEFAULT_TEST_TIMEOUT = 600


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (multihost clusters, SIGKILL soaks, "
        "full workflows, HTTP concurrency); deselect with -m 'not slow' "
        "for the <10 min core tier",
    )
    config.addinivalue_line(
        "markers", "timeout_sec(n): override the per-test SIGALRM cap"
    )


@pytest.fixture(autouse=True)
def _test_timeout(request):
    """Fail (not hang) any test exceeding its wall-clock cap. SIGALRM is
    main-thread only, which is exactly where pytest runs tests; worker
    threads/subprocesses a test spawns are interrupted via the failure's
    teardown."""
    marker = request.node.get_closest_marker("timeout_sec")
    seconds = int(marker.args[0]) if marker else DEFAULT_TEST_TIMEOUT

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded {seconds}s wall-clock cap (conftest SIGALRM "
            "watchdog; mark with @pytest.mark.timeout_sec to raise)"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def rng():
    return np.random.default_rng(2009)
