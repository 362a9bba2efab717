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


def wire_dtype(transfer_dtype):
    """Numpy dtype host arrays are cast to before a host->device copy,
    or None for full-width f32.

    Half-width transfer doubles throughput on wire-bound paths (serving
    requests and the streaming larger-than-HBM tier both measure as
    transfer-bound on bandwidth-limited links, RESULTS.md). Consumers
    cast back to f32 on device, so the only effect is input
    quantization: ~3 significant digits for bfloat16 (keeps f32's
    range), ~4 for float16 (range-limited to ±65k)."""
    if transfer_dtype is None:
        return None
    import numpy as np

    if transfer_dtype == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if transfer_dtype == "float16":
        return np.dtype(np.float16)
    raise ValueError(
        f"transfer_dtype must be None, 'bfloat16' or 'float16', "
        f"got {transfer_dtype!r}"
    )
