"""Precision policy for the TPU rebuild.

The reference runs float64 end-to-end (Cluster/models.py:64,154,965;
Cluster/production.py:95,104). TPUs have no native f64; the rebuild's
contract is f32 parameters with f32 (default) or bf16 (fast) compute, and a
CPU-only f64 parity mode used by numerics tests to bound the f64->f32
transition error (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy threaded through models and train steps.

    param_dtype   : dtype of stored parameters / optimizer state
    compute_dtype : dtype activations are cast to inside layers
    stat_dtype    : dtype for reductions / running statistics (losses, EM
                    sufficient statistics, target distribution)
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    stat_dtype: jnp.dtype = jnp.float32
    #: jax.default_matmul_precision name for matmuls/convs. "default" lets the
    #: MXU run reduced-precision multiplies (fast path); parity tests pin
    #: "float32"/"highest" because even CPU XLA reduces precision by default.
    matmul_precision: str = "default"

    def cast_input(self, x):
        return x.astype(self.compute_dtype)


#: f32 everywhere — numerically closest TPU-supported match to the reference.
DEFAULT = Precision()

#: bf16 activations on the MXU/VPU, f32 params and statistics.
BF16 = Precision(compute_dtype=jnp.bfloat16)

#: f64 parity mode. Only valid on CPU with jax_enable_x64; used by tests to
#: quantify f32 tolerances against the reference's f64 numerics.
PARITY64 = Precision(
    param_dtype=jnp.float64,
    compute_dtype=jnp.float64,
    stat_dtype=jnp.float64,
    matmul_precision="highest",
)
