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

    Reduced-width transfer buys throughput on wire-bound paths directly
    (serving requests and the streaming larger-than-HBM tier both
    measure as transfer-bound on bandwidth-limited links, RESULTS.md).
    Consumers restore f32 on device (`dequant_wire`), so the only effect
    is input quantization: ~3 significant digits for bfloat16 (keeps
    f32's range), ~4 for float16 (range-limited to ±65k), and a uniform
    1/127-of-absmax step for int8 (per-batch symmetric scale carried in
    the wire header, `quantize_wire`)."""
    if transfer_dtype is None:
        return None
    import numpy as np

    if transfer_dtype == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if transfer_dtype == "float16":
        return np.dtype(np.float16)
    if transfer_dtype == "int8":
        return np.dtype(np.int8)
    raise ValueError(
        f"transfer_dtype must be None, 'bfloat16', 'float16' or 'int8', "
        f"got {transfer_dtype!r}"
    )


def quantize_wire(batch, wire):
    """Host-side wire encoding of a float batch before the H2D copy.

    Float wires are a plain cast. The int8 wire is PER-SAMPLE symmetric
    quantization — `q_i = round(x_i / s_i)` with `s_i = absmax_i/127`
    riding along as a (B,1,..,1) header — ~4x fewer bytes than f32 on
    the transfer-bound tiers. Per-sample (not per-batch) scales keep the
    header sharded along the batch axis exactly like the codes, which is
    what makes the encoding SPMD-consistent on multi-process meshes
    where each host quantizes only its local block (a single scalar
    header would differ across processes). `dequant_wire` restores f32
    on device BEFORE any normalization, so the per-sample normalizers
    see (quantized) physical amplitudes, not int codes."""
    import numpy as np

    if wire is None:
        return batch
    if wire != np.int8:
        return batch.astype(wire)
    # Fast path: the native single-pass quantizer (bit-exact with the
    # numpy expression below — pinned by tests/test_native.py). The
    # numpy chain builds five full-array temporaries, which measured
    # ~10 ms per 4096-window batch on this 1-CPU host vs ~2 ms native;
    # on the wire-bound tiers that cost sits on the feed path.
    from spectrogram_cube_clustering_tpu import native

    arr = np.ascontiguousarray(batch, np.float32) if (
        isinstance(batch, np.ndarray) and batch.dtype == np.float32
    ) else None
    if arr is not None:
        fast = native.quantize_int8(arr)
        if fast is not None:
            return {"q": fast[0], "scale": fast[1]}
    # rank >= 2: axis 0 is the batch (per-sample scales). Rank 1 (a raw
    # waveform segment on the fused serving wire) is ONE sample: a single
    # scale for the whole segment.
    red = tuple(range(1, batch.ndim)) if batch.ndim > 1 else (0,)
    absmax = np.max(np.abs(batch), axis=red, keepdims=True)
    scale = np.maximum(
        absmax.astype(np.float32) / 127.0, np.finfo(np.float32).tiny
    )
    q = np.clip(np.rint(batch / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale}


def dequant_wire(x):
    """Device-side inverse of `quantize_wire`, safe for full-width
    batches too: int8 wire dicts dequantize with their per-sample header
    scales (broadcast over the trailing axes), anything else is cast to
    f32. Runs inside the consumer's jitted step, so it fuses with the
    first op for free."""
    import jax.numpy as jnp

    if isinstance(x, dict):
        return x["q"].astype(jnp.float32) * x["scale"]
    return x.astype(jnp.float32)


def wire_array(x):
    """The bulk array of a wire batch (the int8 codes for the int8 wire,
    the batch itself otherwise) — for consumers that need shape/sharding
    of what actually crossed the wire."""
    return x["q"] if isinstance(x, dict) else x
