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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2009)
