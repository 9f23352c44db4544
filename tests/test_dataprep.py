"""Data-prep utilities (reference scripts/data_processing + run_pointwise
interpolation parity)."""

import numpy as np
import pytest

from ebcc_tpu import dataprep


def test_upsample_identity_and_wraparound():
    rng = np.random.default_rng(0)
    arr = rng.normal(0, 1, (4, 5, 6)).astype(np.float32)
    out = dataprep.upsample_3t_2s(arr)
    assert out.shape == (12, 9, 12)
    # the reference's own invariant (interpolate_npy_array.py:60)
    np.testing.assert_array_equal(arr, out[0::3, 0::2, 0::2])
    # inserted lon column 2w-1 averages last and FIRST columns (wraparound)
    np.testing.assert_allclose(
        out[:, :, -1], (out[:, :, -2] + out[:, :, 0]) / 2, rtol=1e-6)
    # time thirds: step boundaries are linear toward the next step
    np.testing.assert_allclose(out[1, 0::2, 0::2],
                               (2 * arr[0] + arr[1]) / 3, rtol=1e-5)
    # constant fill at the end of time ((a + 2a)/3: equal to 1 ulp)
    np.testing.assert_allclose(out[-1, 0::2, 0::2], arr[-1], rtol=1e-6)


def test_bilinear_exact_on_linear_field():
    src_lat = np.linspace(90, -90, 19)
    src_lon = np.arange(0, 360, 20.0)
    lat_g, lon_g = np.meshgrid(src_lat, src_lon, indexing="ij")
    data = (2.0 * lat_g + 0.5 * lon_g).astype(np.float32)
    dst_lat = np.linspace(80, -80, 33)
    dst_lon = np.arange(0, 340, 10.0)
    out = dataprep.interpolate_to_grid(data, src_lat, src_lon,
                                       dst_lat, dst_lon)
    lat_t, lon_t = np.meshgrid(dst_lat, dst_lon, indexing="ij")
    np.testing.assert_allclose(out, 2.0 * lat_t + 0.5 * lon_t, rtol=1e-5)


def test_lon_wraparound_seam():
    src_lat = np.array([10.0, 0.0])
    src_lon = np.arange(0, 360, 90.0)  # 0, 90, 180, 270
    data = np.asarray([[1.0, 2.0, 3.0, 4.0]] * 2, np.float32)
    # target lon 315 sits between 270 and the wrapped 360 (== column 0)
    out = dataprep.interpolate_to_grid(data, src_lat, src_lon,
                                       np.array([5.0]), np.array([315.0]))
    assert out.shape == (1, 1)
    np.testing.assert_allclose(out[0, 0], (4.0 + 1.0) / 2, rtol=1e-6)


def test_time_interpolation_clamps():
    data = np.stack([np.full((2, 2), v, np.float32) for v in (0.0, 10.0)])
    out = dataprep.interpolate_time(data, [0.0, 1.0], [-1.0, 0.25, 2.0])
    np.testing.assert_allclose(out[:, 0, 0], [0.0, 2.5, 10.0], rtol=1e-6)


def test_spread_feeds_pointwise_workflow(small_frame):
    """End-to-end: coarse ensemble spread -> interpolated per-point bound
    -> pointwise compression under that bound (the run_pointwise.py
    workflow)."""
    from ebcc_tpu.models import DirectCompressor
    from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
    h, w = small_frame.shape
    rng = np.random.default_rng(2)
    # coarse 2x-coarser spread field over two source times
    src_lat = np.linspace(0, h - 1, h // 2)
    src_lon = np.arange(0, w, 2.0) * (360.0 / w)
    spread = rng.uniform(0.05, 0.4,
                         (2, h // 2, w // 2)).astype(np.float32)
    dst_lat = np.arange(h, dtype=np.float64)
    dst_lon = np.arange(w, dtype=np.float64) * (360.0 / w)
    eb = dataprep.ensemble_spread_to_reanalysis(
        spread, src_lat, src_lon, [0.0, 1.0], dst_lat, dst_lon, [0.5])[0]
    assert eb.shape == (h, w)
    assert (eb > 0).all()
    cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=50,
                     max_batch=1)
    direct = DirectCompressor(config=cfg)
    rec = direct.decompress(direct.compress(small_frame, eb))
    assert np.all(np.abs(rec - small_frame) <= eb)


def test_cache_npy(tmp_path):
    calls = []
    path = str(tmp_path / "a" / "b.npy")

    def produce():
        calls.append(1)
        return np.arange(6).reshape(2, 3)

    a1 = dataprep.cache_npy(path, produce)
    a2 = dataprep.cache_npy(path, produce)
    np.testing.assert_array_equal(a1, a2)
    assert len(calls) == 1  # second call loaded the cache
