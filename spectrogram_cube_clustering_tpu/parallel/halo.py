"""Halo exchange and time-sharded STFT.

The reference scales long recordings by *windowing* (independent 4-row
spectrogram windows, ZarrDataLoader.py:62-85) — there is no sequence
parallelism to port. The TPU-native analog (SURVEY.md §2.2 "SP/CP" row):
shard the raw-waveform time axis across the data mesh and exchange a
(nperseg - hop)-sample halo with the right neighbor via `ppermute`, so
every device computes its STFT frames locally and the concatenation is
bit-identical to the single-device spectrogram.

Frame alignment requires each shard's length to be a multiple of `hop`
(true by construction when the host splits the waveform evenly).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS


def halo_exchange_1d(x: jnp.ndarray, halo: int, axis_name: str = DATA_AXIS):
    """Append the first `halo` samples of the right neighbor's shard.

    Inside shard_map: x (local_t, ...) -> (local_t + halo, ...). The last
    device receives zeros (its tail frames are dropped by the caller, same
    as the single-device trailing-partial-frame drop).
    """
    n = lax.axis_size(axis_name)
    # send my leading halo to my LEFT neighbor == receive from RIGHT
    head = lax.slice_in_dim(x, 0, halo, axis=0)
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = lax.ppermute(head, axis_name, perm)
    idx = lax.axis_index(axis_name)
    recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
    return jnp.concatenate([x, recv], axis=0)


def sharded_spectrogram(
    x: jnp.ndarray,
    mesh: Mesh,
    nperseg: int = 200,
    hop: int = 100,
    log: bool = True,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Time-sharded log-power spectrogram over a 1-D mesh.

    x (T,) is sharded along time; each device computes frames over its
    shard plus an (nperseg - hop) halo. Output (n_frames, nfreq) matches
    `signal.stft.spectrogram(x)` exactly for T a multiple of
    (mesh_size * hop); frames never straddle more than the halo because
    frame starts are hop-aligned.
    """
    from spectrogram_cube_clustering_tpu.signal.stft import (
        frame,
        hann_window,
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
    frames_per_dev = local_t // hop  # with halo: last frame start = local_t - hop

    win = hann_window(nperseg)

    def local_spec(xs):
        xs = halo_exchange_1d(xs, halo)
        f = frame(xs, nperseg, hop)  # (frames_per_dev, nperseg)
        spec = jnp.fft.rfft(f * win, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return jnp.log10(power + eps) if log else power

    mapped = jax.shard_map(
        local_spec,
        mesh=mesh,
        in_specs=P(DATA_AXIS),
        out_specs=P(DATA_AXIS),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    out = mapped(x)
    # Trailing frames of the LAST device that spill past T are zero-halo
    # artifacts; the global frame count drops them.
    n_frames = (t - nperseg) // hop + 1
    return out[:n_frames]
