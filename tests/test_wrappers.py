"""HDF5 / zarr wrapper round-trips (reference: test.py:17-59,
zarr_test.py:4-10)."""

import io

import numpy as np
import pytest

from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.wrappers import hdf5 as whdf5

H, W = 64, 128


@pytest.fixture(scope="module")
def cfg():
    return EBCCConfig(mode=ResidualMode.RELATIVE_ERROR, error=0.009,
                      base_cr=50, max_batch=1)


def test_hdf5_roundtrip(era5_frame, cfg, tmp_path):
    h5py = pytest.importorskip("h5py")
    data = era5_frame[:H, :W]
    with h5py.File(tmp_path / "t.h5", "w") as f:
        whdf5.write_dataset(f, "compressed", data, cfg)
    with h5py.File(tmp_path / "t.h5", "r") as f:
        assert whdf5.is_ebcc_dataset(f["compressed"])
        rec = whdf5.read_dataset(f["compressed"])
    assert rec.shape == data.shape
    rng = data.max() - data.min()
    # achieved relative error check, as in reference test.py:44-51
    assert np.max(np.abs(rec - data)) / rng <= 0.009


def test_filter_params_render_config():
    p = whdf5.EBCCFilterParams(base_cr=30,
                               residual_opt=("relative_error_target", 0.01))
    c = p.to_config()
    assert c.mode == ResidualMode.RELATIVE_ERROR
    assert c.error == 0.01
    assert c.base_cr == 30


def test_filter_params_pointwise():
    p = whdf5.EBCCFilterParams(residual_opt=("pointwise_max_error", 0.5))
    assert p.to_config().mode == ResidualMode.POINTWISE_MAX_ERROR


def test_zarr_shim_gated():
    from ebcc_tpu.wrappers import zarr as wzarr
    if wzarr.HAVE_NUMCODECS:
        codec = wzarr.EBCCZarrFilter(H, W, error=0.05, base_cr=50)
        data = np.random.default_rng(0).normal(
            260, 5, (1, H, W)).astype(np.float32)
        out = np.frombuffer(codec.decode(codec.encode(data)),
                            np.float32).reshape(data.shape)
        assert np.max(np.abs(out - data)) <= 0.05
    else:
        with pytest.raises(ImportError):
            wzarr.EBCCZarrFilter(H, W)
