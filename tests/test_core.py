"""Core plumbing tests: mesh helpers, shardings, precision policies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import core
from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS, DCN_AXIS


class TestMesh:
    def test_data_mesh_spans_devices(self):
        mesh = core.make_data_mesh()
        assert mesh.axis_names == (DATA_AXIS,)
        assert mesh.devices.size == len(jax.devices())

    def test_pad_to_multiple(self):
        assert core.pad_to_multiple(10, 8) == 16
        assert core.pad_to_multiple(16, 8) == 16
        assert core.pad_to_multiple(1, 8) == 8

    def test_shard_batch_rejects_uneven(self):
        mesh = core.make_data_mesh()
        with pytest.raises(ValueError, match="not divisible"):
            core.shard_batch(mesh, jnp.zeros((9, 4)))

    def test_shard_batch_places_on_mesh(self):
        mesh = core.make_data_mesh()
        x = core.shard_batch(mesh, jnp.zeros((16, 4)))
        assert x.sharding.is_equivalent_to(
            core.batch_sharding(mesh, 2), ndim=2
        )

    def test_multislice_axes(self):
        mesh = core.make_multislice_mesh(4)
        assert mesh.axis_names == (DCN_AXIS, DATA_AXIS)
        assert mesh.devices.shape == (4, 2)


class TestPrecision:
    def test_policies(self):
        assert core.DEFAULT.compute_dtype == jnp.float32
        assert core.BF16.compute_dtype == jnp.bfloat16
        assert core.BF16.param_dtype == jnp.float32
        assert core.PARITY64.compute_dtype == jnp.float64

    def test_cast_input(self):
        x = np.zeros((2, 2), np.float32)
        assert core.BF16.cast_input(jnp.asarray(x)).dtype == jnp.bfloat16
