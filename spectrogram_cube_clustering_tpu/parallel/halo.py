"""Halo exchange and time-sharded STFT.

The reference scales long recordings by *windowing* (independent 4-row
spectrogram windows, ZarrDataLoader.py:62-85) — there is no sequence
parallelism to port. The TPU-native analog (SURVEY.md §2.2 "SP/CP" row):
shard the raw-waveform time axis across the data mesh and exchange a
(nperseg - hop)-sample halo with the right neighbor via `ppermute`, so
every device computes its STFT frames locally and the concatenation is
bit-identical to the single-device spectrogram.

Each device computes its local frames with the fused Pallas STFT kernel
(`ops.pallas_stft`, the rawread matmul-DFT path: 16.5 Gsamples/s on v5e,
~230x XLA's rfft routing — benchmarks/RESULTS.md) whenever the backend
and geometry allow — so the scale-out path runs at flagship-kernel
per-device throughput, not rfft throughput.

Frame alignment requires each shard's length to be a multiple of `hop`
(true by construction when the host splits the waveform evenly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS


def halo_exchange_1d(
    x: jnp.ndarray, halo: int, axis_name: str = DATA_AXIS, axis: int = 0
):
    """Append the first `halo` samples of the right neighbor's shard.

    Inside shard_map: x (..., local_t, ...) -> local_t + halo along
    `axis`. The last device receives zeros (its tail frames are dropped
    by the caller, same as the single-device trailing-partial-frame
    drop).
    """
    n = lax.axis_size(axis_name)
    # send my leading halo to my LEFT neighbor == receive from RIGHT
    head = lax.slice_in_dim(x, 0, halo, axis=axis)
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = lax.ppermute(head, axis_name, perm)
    idx = lax.axis_index(axis_name)
    recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
    return jnp.concatenate([x, recv], axis=axis)


def sharded_spectrogram(
    x: jnp.ndarray,
    mesh: Mesh,
    nperseg: int = 200,
    hop: int = 100,
    log: bool = True,
    eps: float = 1e-12,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Time-sharded log-power spectrogram over a 1-D mesh.

    x (..., T) — any leading batch/channel dims, replicated across the
    mesh — is sharded along time; each device computes frames over its
    shard plus an (nperseg - hop) halo. Output (..., n_frames, nfreq)
    matches `signal.stft.spectrogram(x)` exactly for T a multiple of
    (mesh_size * hop); frames never straddle more than the halo because
    frame starts are hop-aligned.

    `use_pallas=None` auto-selects the fused Pallas kernel on TPU
    backends with eligible geometry (`signal.stft.pallas_eligible`);
    `use_pallas=True` forces it, running in interpret mode off-TPU
    (the CPU-mesh test/dryrun path); `False` uses the XLA rfft path.
    """
    from spectrogram_cube_clustering_tpu.signal.stft import (
        frame,
        hann_window,
        pallas_eligible,
    )

    n_dev = mesh.devices.size
    t = x.shape[-1]
    if t % (n_dev * hop) != 0:
        raise ValueError(
            f"time length {t} must be a multiple of mesh*hop = {n_dev * hop}"
        )
    halo = nperseg - hop
    local_t = t // n_dev
    if halo > local_t:
        # halo_exchange_1d reaches ONE right neighbor, so a shard must
        # cover the whole overlap; otherwise the in-shard slice of the
        # leading `halo` samples fails deep inside shard_map with an
        # opaque trace error
        raise ValueError(
            f"halo nperseg - hop = {halo} exceeds the per-device shard "
            f"length {local_t}; use fewer devices or a longer signal "
            f"(need T >= mesh * (nperseg - hop))"
        )

    # Key the kernel choice on the MESH's device platform, not the
    # process default backend: a CPU mesh in a TPU-default process must
    # not get a compiled Mosaic kernel (and vice versa).
    mesh_platform = next(iter(mesh.devices.flat)).platform
    if use_pallas is None:
        use_pallas = log and pallas_eligible(
            nperseg, hop, platform=mesh_platform
        )
    if use_pallas:
        if nperseg % hop != 0 or hop > 128:
            raise ValueError(
                "pallas STFT requires nperseg % hop == 0 and hop <= 128"
            )
        if not log:
            raise ValueError("pallas STFT always returns log power")
    mapped = _mapped_local_spec(
        mesh, nperseg=nperseg, hop=hop, log=log, eps=eps,
        use_pallas=use_pallas, batch_dims=x.ndim - 1,
    )
    spec_in = P(*([None] * (x.ndim - 1)), DATA_AXIS)
    x = jax.device_put(x, NamedSharding(mesh, spec_in))
    out = mapped(x)
    # Trailing frames of the LAST device that spill past T are zero-halo
    # artifacts; the global frame count drops them.
    n_frames = (t - nperseg) // hop + 1
    return out[..., :n_frames, :]


def _mapped_local_spec(
    mesh: Mesh, *, nperseg: int, hop: int, log: bool, eps: float,
    use_pallas: bool, batch_dims: int,
):
    """The shard_mapped per-device STFT: (..., T time-sharded) ->
    (..., T // hop frames time-sharded, nfreq). Jit-friendly (no
    device_put) so callers can compose it inside larger programs —
    `sharded_spectrogram` wraps it for host arrays, serve's mesh-fused
    waveform route inlines it before the batch-sharded model pass.
    The caller slices the global (t - nperseg) // hop + 1 real frames."""
    from spectrogram_cube_clustering_tpu.signal.stft import (
        frame,
        hann_window,
    )

    halo = nperseg - hop
    win = hann_window(nperseg)
    interpret = next(iter(mesh.devices.flat)).platform != "tpu"

    def local_spec(xs):
        # xs (..., local_t) -> (..., local_t // hop, nfreq): the halo
        # extends the shard so every hop-aligned frame start in
        # [0, local_t) yields a full frame
        xs = halo_exchange_1d(xs, halo, axis=-1)
        if use_pallas:
            from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
                spectrogram_pallas,
            )

            return spectrogram_pallas(
                xs, nperseg=nperseg, hop=hop, eps=eps, interpret=interpret
            )
        f = frame(xs, nperseg, hop)  # (..., local_t // hop, nperseg)
        spec = jnp.fft.rfft(f * win, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return jnp.log10(power + eps) if log else power

    spec_in = P(*([None] * batch_dims), DATA_AXIS)
    spec_out = P(*([None] * batch_dims), DATA_AXIS, None)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which trips shard_map's vma validation; the halo path's
    # cross-device semantics are pinned by parity tests instead
    return jax.shard_map(
        local_spec, mesh=mesh, in_specs=spec_in, out_specs=spec_out,
        check_vma=not use_pallas,
    )
