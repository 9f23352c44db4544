"""Real HDF5 filter plugin round-trip (reference parity: h5z_j2k.c).

Writes a filtered float dataset (pre-compressed chunks via H5Dwrite_chunk)
and reads it back transparently through the C plugin — no JAX on the read
path inside libhdf5.
"""

import os

import numpy as np
import pytest

from ebcc_tpu import EBCCConfig, ResidualMode
from ebcc_tpu.wrappers import hdf5 as whdf5

_PLUGIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libh5z_ebcc_tpu.so")

H, W = 96, 160  # small_frame dims (conftest)

if not os.path.exists(_PLUGIN):  # pragma: no cover
    pytest.skip("HDF5 filter plugin not built (make -C native)",
                allow_module_level=True)


def test_filtered_dataset_roundtrip(small_frame, tmp_path):
    h5py = pytest.importorskip("h5py")
    data = np.stack([small_frame, small_frame * 1.01])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=50,
                     max_batch=2)
    path = tmp_path / "filtered.h5"
    with h5py.File(path, "w") as f:
        dset = whdf5.write_filtered_dataset(f, "t2m", data, cfg)
        assert dset.shape == data.shape
    whdf5.register_plugin_path()
    with h5py.File(path, "r") as f:
        assert f["t2m"].dtype == np.float32
        rec = f["t2m"][:]          # transparent decode via the plugin
        one = f["t2m"][1]          # partial (single-chunk) read
    assert float(np.abs(rec - data).max()) <= 0.5
    assert float(np.abs(one - data[1]).max()) <= 0.5

    # creation + writes must still work with the plugin registered:
    # direct-chunk writes compress; plain writes store raw but read exactly
    path2 = tmp_path / "post_registration.h5"
    with h5py.File(path2, "w") as f:
        whdf5.write_filtered_dataset(f, "t2m", data, cfg)
        ds = f.create_dataset("raw", shape=data.shape, dtype=np.float32,
                              chunks=(1, H, W),
                              compression=whdf5.FILTER_ID,
                              allow_unknown_filter=True)
        ds[...] = data
    with h5py.File(path2, "r") as f:
        assert float(np.abs(f["t2m"][:] - data).max()) <= 0.5
        np.testing.assert_array_equal(f["raw"][:], data)


def test_corrupt_chunk_fails_cleanly(tmp_path):
    h5py = pytest.importorskip("h5py")
    whdf5.register_plugin_path()
    path = tmp_path / "corrupt.h5"
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("c", shape=(1, H, W), dtype=np.float32,
                              chunks=(1, H, W),
                              compression=whdf5.FILTER_ID,
                              allow_unknown_filter=True)
        ds.id.write_direct_chunk((0, 0, 0),
                                 b"EBT1" + bytes([2, 0]) + b"\x00" * 40,
                                 filter_mask=0)
    with h5py.File(path, "r") as f:
        with pytest.raises(OSError):
            f["c"][:]
