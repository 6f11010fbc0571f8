"""load_array compatibility with the reference's hickle files.

The reference persists every stage as gzip hickle (HDF5) dumps
(reference: src/downloading/io.py, raw schema
src/download_and_predict_job.py:507-517). hickle is not installed in
this image and the reference snapshot ships no .hkl tiles, so these
fixtures replicate hickle's on-disk HDF5 layouts byte-for-byte with
h5py:

- hickle 3.x: root dataset 'data_0' (+ attrs 'type': [b'ndarray']),
  sidecar group 'data_0_attrs'
- hickle 4.x: root dataset 'data' with attrs 'type'/'base_type'
  (pickled b'ndarray'), root attrs HICKLE_VERSION etc., gzip
  compression as the reference passes compression='gzip'
"""
import h5py
import numpy as np
import pytest

from ttc.io.arrays import load_array


@pytest.fixture
def arr(rng=None):
    return (np.random.default_rng(3).random((5, 16, 16, 2)) * 4e4) \
        .astype(np.uint16)


def test_hickle4_layout(tmp_path, arr):
    path = str(tmp_path / "tile.hkl")
    with h5py.File(path, "w") as f:
        f.attrs["HICKLE_VERSION"] = "4.0.4"
        f.attrs["HICKLE_PYTHON_VERSION"] = "3.8.10"
        ds = f.create_dataset("data", data=arr, compression="gzip",
                              compression_opts=4)
        ds.attrs["type"] = np.void(b"\x80\x03cnumpy\nndarray\nq\x00.")
        ds.attrs["base_type"] = b"ndarray"
    np.testing.assert_array_equal(load_array(path), arr)


def test_hickle3_layout(tmp_path, arr):
    path = str(tmp_path / "tile3.hkl")
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("data_0", data=arr, compression="gzip")
        ds.attrs["type"] = [b"ndarray"]
        g = f.create_group("data_0_attrs")  # empty sidecar group
        g.attrs["type"] = [b"dict"]
    np.testing.assert_array_equal(load_array(path), arr)


def test_nested_group_dump(tmp_path, arr):
    """hickle dict dumps nest datasets under groups."""
    path = str(tmp_path / "nested.hkl")
    with h5py.File(path, "w") as f:
        g = f.create_group("data")
        g.attrs["type"] = [b"dict"]
        g.create_dataset('"s2"', data=arr, compression="gzip")
    np.testing.assert_array_equal(load_array(path), arr)


def test_scalar_dataset_skipped(tmp_path, arr):
    """Scalar metadata datasets must not shadow the array."""
    path = str(tmp_path / "meta.hkl")
    with h5py.File(path, "w") as f:
        f.create_dataset("a_version", data=3)
        f.create_dataset("zz_data", data=arr)
    np.testing.assert_array_equal(load_array(path), arr)
