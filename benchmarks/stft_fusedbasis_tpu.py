"""STFT kernel experiment: fuse cos|sin bases into one N=256 dot.

The shipped rawread kernel (ops/pallas_stft.py) issues 2*ratio dots of
(fpb+halo, hop) @ (hop, nfreq_pad) per grid step — cos and sin
separately. This experiment concatenates the two bases along the lane
axis into (hop, 2*nfreq_pad) and issues ratio dots of N=256, splitting
the output with lane-axis slices of the dot VALUES (the documented v5e
hazards are sublane-shifted slices as matmul OPERANDS and lane-axis
concats of shifted VIEWS; lane slices of dot outputs are neither).
Also sweeps frames_per_block for both variants.

Run from /root/repo. Prints one JSON line at the end.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def build_fused(nperseg=200, hop=100, eps=1e-12, fpb=512, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        LANE,
        SUBLANE,
        _round_up,
        _windowed_dft_bases,
    )

    ratio = nperseg // hop
    halo = _round_up(max(ratio - 1, 1), SUBLANE)
    assert fpb % halo == 0
    nfreq = nperseg // 2 + 1
    nfreq_pad = _round_up(nfreq, LANE)
    cos, sin = _windowed_dft_bases(nperseg, hop, nfreq_pad)
    # (ratio, LANE, 2*nfreq_pad): lanes [0, nfreq_pad) cos, rest sin
    bases = jnp.concatenate([cos, sin], axis=2)

    def kernel(rowsA_ref, rowsB_ref, b_ref, out_ref):
        nf = out_ref.shape[1]
        rows_cat = jnp.concatenate([rowsA_ref[:], rowsB_ref[:]], axis=0)
        c = jnp.zeros((fpb, nfreq_pad), jnp.float32)
        s = jnp.zeros_like(c)
        for j in range(ratio):
            y = jnp.dot(
                rows_cat, b_ref[j, :hop, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            c += y[j : j + fpb, :nfreq_pad]
            s += y[j : j + fpb, nfreq_pad:]
        out_ref[:] = jnp.log10(c * c + s * s + eps)[:, :nf]

    @functools.partial(jax.jit, static_argnames=("t",))
    def run(x, t):
        n_frames = (t - nperseg) // hop + 1
        rows_avail = t // hop
        n_main = (rows_avail - halo) // fpb
        frames_main = n_main * fpb
        assert frames_main > 0
        x2 = x[: rows_avail * hop].reshape(rows_avail, hop)
        call = pl.pallas_call(
            kernel,
            grid=(n_main,),
            in_specs=[
                pl.BlockSpec(
                    (fpb, hop), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (halo, hop), lambda i: ((i + 1) * (fpb // halo), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ratio, LANE, 2 * nfreq_pad), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (fpb, nfreq), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((frames_main, nfreq), jnp.float32),
            interpret=interpret,
        )
        out = call(x2, x2, bases)
        return out[:n_frames] if frames_main >= n_frames else out

    return run


def two_point(fn, x, n, chain_len=100, reps=3):
    import jax
    import jax.numpy as jnp

    def make_chain(length):
        @jax.jit
        def chain(xx, salt):
            def body(carry, _):
                xc, acc = carry
                out = fn(xc)
                dep = jnp.sum(out[..., :1, :8]) * 1e-30
                xc = xc.at[0].add(dep + salt + 1.0)
                return (xc, acc + dep), None

            (xc, acc), _ = jax.lax.scan(
                body, (xx, jnp.float32(0.0)), None, length=length
            )
            return acc + xc[0]

        return chain

    c1, c2 = make_chain(chain_len), make_chain(2 * chain_len)
    t0 = time.perf_counter()
    float(c1(x, jnp.float32(0.0)))
    float(c2(x, jnp.float32(0.0)))
    print(f"  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    rates = []
    for r in range(reps):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(x, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(c2(x, salt + 0.5))
        t2 = time.perf_counter() - t0
        rates.append(n * chain_len / max(t2 - t1, 1e-9))
    rates.sort()
    return rates[len(rates) // 2], rates


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    print(f"backend: {jax.default_backend()}", flush=True)
    n = 4_000_000
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n,)).astype(np.float32)
    )
    n_use = (n // 100 - 8) // 512 * 512 * 100  # frames_main coverage only

    ref = np.asarray(spectrogram(x))
    results = {}

    fused = build_fused(fpb=512)
    got = np.asarray(fused(x, n))
    err = float(np.abs(got - ref[: got.shape[0]]).max())
    print(f"fused-basis parity: {got.shape}, max abs {err:.3e}", flush=True)
    results["fused_err"] = err
    if err > 3e-3:
        print(json.dumps({"ok": False, **results}))
        return

    med, r = two_point(lambda v: fused(v, n), x, n)
    print(f"fused fpb=512:   {med/1e9:.2f} Gsamples/s  {sorted(r)}", flush=True)
    results["fused_512"] = round(med / 1e9, 2)

    med, r = two_point(lambda v: spectrogram_pallas(v), x, n)
    print(f"shipped fpb=512: {med/1e9:.2f} Gsamples/s  {sorted(r)}", flush=True)
    results["shipped_512"] = round(med / 1e9, 2)

    for fpb in (256, 1024, 2048):
        med, r = two_point(
            lambda v, f=fpb: spectrogram_pallas(v, frames_per_block=f), x, n
        )
        print(f"shipped fpb={fpb}: {med/1e9:.2f} Gsamples/s  {sorted(r)}",
              flush=True)
        results[f"shipped_{fpb}"] = round(med / 1e9, 2)

    fused2 = build_fused(fpb=1024)
    med, r = two_point(lambda v: fused2(v, n), x, n)
    print(f"fused fpb=1024:  {med/1e9:.2f} Gsamples/s  {sorted(r)}", flush=True)
    results["fused_1024"] = round(med / 1e9, 2)

    print(json.dumps({"ok": True, **results}))


if __name__ == "__main__":
    main()
