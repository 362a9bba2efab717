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
