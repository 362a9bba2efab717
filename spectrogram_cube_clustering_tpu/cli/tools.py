"""Console tools over HDF5 catalogs.

Parity targets (reference setup.py:13-20 console scripts):
- `query-h5size`         <- query_H5size        (utils.py:1105-1123)
- `extract-h5dataset`    <- extractH5dataset    (utils.py:697-863)
- `generate-sample-index`<- generate_sample_index (utils.py:872-907)
- `convert-h5-to-np`     <- convert_H5_to_NP    (utils.py:649-694)
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

from spectrogram_cube_clustering_tpu.data import h5 as h5mod


def query_h5size(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description="Print H5 catalog dims.")
    parser.add_argument("path", help="path to .h5/.hd5 database")
    args = parser.parse_args(argv)
    m, n, o = h5mod.query_db_size(args.path)
    print(f" >> h5 dataset contains {m} samples with dimensions [{n},{o}]. <<")


def extract_h5dataset(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Create a filtered copy of an H5 catalog."
    )
    parser.add_argument("source")
    parser.add_argument("dest")
    parser.add_argument("--include", help="JSON list of stations to include")
    parser.add_argument("--exclude", help="JSON list of stations to exclude")
    parser.add_argument("--after", help="include after YYYYMMDDTHHMMSS")
    parser.add_argument("--before", help="include before YYYYMMDDTHHMMSS")
    args = parser.parse_args(argv)
    kept = h5mod.extract_h5_dataset(
        args.source,
        args.dest,
        include=json.loads(args.include) if args.include else None,
        exclude=json.loads(args.exclude) if args.exclude else None,
        after=args.after,
        before=args.before,
    )
    print(f"Extracted {kept} samples to {args.dest}")


def generate_sample_index(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Draw a random train/val sample index pickle."
    )
    parser.add_argument("M", type=int, help="number of samples to draw")
    parser.add_argument("path", help="path to h5 dataset")
    parser.add_argument("savepath", help="directory for the index pickle")
    args = parser.parse_args(argv)
    h5mod.save_traval_index(args.M, args.path, args.savepath)


def convert_h5_to_np(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Convert H5 catalog spectrograms to a .npy file."
    )
    parser.add_argument("source")
    parser.add_argument("--dest", default=None)
    args = parser.parse_args(argv)
    dest = h5mod.convert_h5_to_np(args.source, args.dest)
    print(f"Saved {dest}")


def build_cube(argv: Optional[list] = None) -> None:
    """Raw waveforms -> spectrogram Zarr cube (the upstream stage the
    reference assumes was run elsewhere; SURVEY.md §5 'Long-context').

    Input: .npy waveform, 1-D (T,) or (channels, T). Output: a Zarr v2
    group holding a (time_frames, channels, n_freq) cube chunked like the
    reference's (ZarrDataLoader.py:49), STFT computed on device (fused
    Pallas kernel on TPU).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectrogram_cube_clustering_tpu.data import zarrlite
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    parser = argparse.ArgumentParser(description=build_cube.__doc__)
    parser.add_argument("waveform", help="path to .npy waveform")
    parser.add_argument("dest", help="output Zarr group directory")
    parser.add_argument("--nperseg", type=int, default=200)
    parser.add_argument("--hop", type=int, default=100)
    parser.add_argument("--chunk-rows", type=int, default=5758)
    args = parser.parse_args(argv)

    wave = np.load(args.waveform)
    if wave.ndim == 1:
        wave = wave[None, :]
    from spectrogram_cube_clustering_tpu.signal.stft import pallas_eligible

    if pallas_eligible(args.nperseg, args.hop):
        from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
            spectrogram_pallas as stft,
        )
    else:
        stft = spectrogram
    spec = np.asarray(
        stft(jnp.asarray(wave), nperseg=args.nperseg, hop=args.hop)
    )  # (C, frames, nfreq)
    cube = np.transpose(spec, (1, 0, 2)).astype(np.float32)
    zarrlite.write_group(
        args.dest, {"cube": cube},
        chunks=(min(args.chunk_rows, cube.shape[0]), 1, cube.shape[2]),
    )
    print(
        f"Wrote cube {cube.shape} (frames, channels, freq) to {args.dest}"
    )


def convert_torch_checkpoint(argv: Optional[list] = None) -> None:
    """Convert a trained reference `.pt` checkpoint to an orbax directory
    usable as `saved_weights` by this framework (utils.torch_port)."""
    from spectrogram_cube_clustering_tpu.utils import torch_port

    parser = argparse.ArgumentParser(description=convert_torch_checkpoint.__doc__)
    parser.add_argument("pt_path", help="path to the .pt state_dict")
    parser.add_argument("out_dir", help="output orbax checkpoint directory")
    parser.add_argument("--model", choices=["auto", "AEC", "DEC"], default="auto")
    args = parser.parse_args(argv)
    out = torch_port.convert_checkpoint(args.pt_path, args.out_dir, args.model)
    print(f"Converted to {out}")


def export_torch_checkpoint(argv: Optional[list] = None) -> None:
    """Export an orbax checkpoint (AEC/DEC params trained here) to a
    reference-loadable `.pt` state_dict — migration runs in both
    directions (utils.torch_port.export_checkpoint)."""
    from spectrogram_cube_clustering_tpu.utils import torch_port

    parser = argparse.ArgumentParser(description=export_torch_checkpoint.__doc__)
    parser.add_argument("ckpt_dir", help="orbax checkpoint directory")
    parser.add_argument("out_pt", help="output .pt path")
    parser.add_argument("--model", choices=["auto", "AEC", "DEC"], default="auto")
    args = parser.parse_args(argv)
    out = torch_port.export_checkpoint(args.ckpt_dir, args.out_pt, args.model)
    print(f"Exported to {out}")
