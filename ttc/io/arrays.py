"""Compressed array store (.h5) replacing the reference's hickle files.

The reference persists every pipeline stage as gzip hickle (HDF5)
arrays (reference: src/downloading/io.py, raw-file schema
src/download_and_predict_job.py:507-517). We write plain HDF5 with one
gzip dataset named "data" — h5py reads hickle-4 files' underlying
datasets too, so recorded reference tiles can serve as fixtures.
"""
from __future__ import annotations

import os

import h5py
import numpy as np


def save_array(path: str, arr: np.ndarray, compress: bool = True):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        if compress:
            f.create_dataset("data", data=arr, compression="gzip",
                             compression_opts=4)
        else:
            f.create_dataset("data", data=arr)
    return path


def load_array(path: str) -> np.ndarray:
    """Load our own files and plain hickle dumps: takes the first
    array-like dataset in the file."""
    with h5py.File(path, "r") as f:
        ds = _first_dataset(f)
        if ds is None:
            raise ValueError(f"no dataset found in {path}")
        return np.asarray(ds)


def _first_dataset(group):
    named = group.get("data")
    if isinstance(named, h5py.Dataset):
        return named
    for key in group:
        item = group[key]
        if isinstance(item, h5py.Dataset) and item.shape != ():
            return item
        if isinstance(item, h5py.Group):
            found = _first_dataset(item)
            if found is not None:
                return found
    return None
