"""Tests for the higher-level compressor families.

Mirrors the reference's bound-enforcement integration tests
(scripts/delta_compression_test.py:144-199, scripts/run_pointwise.py:157-183,
scripts/pressure_levels_ebcc_example.py:79-106): every compressor must keep
|x - x_hat| <= bound at every point, and the delta/predictive chains must
round-trip exactly against their own decoders.
"""

import numpy as np
import pytest

from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.models import (DeltaCompressor, DirectCompressor,
                             PredictiveCompressor, RateOptimizedCompressor)

H, W = 64, 128


@pytest.fixture(scope="module")
def stack(era5_frame):
    """[4, H, W] correlated stack (pressure levels / time steps)."""
    rng = np.random.default_rng(7)
    base = era5_frame[:H, :W]
    lev = [base]
    for _ in range(3):
        lev.append(lev[-1] * 0.98 + rng.normal(0, 0.2, (H, W)))
    return np.stack(lev).astype(np.float32)


@pytest.fixture(scope="module")
def direct():
    cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=50,
                     max_batch=1)
    return DirectCompressor(config=cfg)


def test_direct_hard_guarantee(stack, direct):
    data = stack[0]
    eb = np.full_like(data, 0.1)
    blob = direct.compress(data, eb)
    rec = direct.decompress(blob)
    assert rec.shape == data.shape
    assert np.all(np.abs(rec - data) <= eb)
    assert len(blob) < data.nbytes


def test_direct_spatially_varying_bound(stack, direct):
    data = stack[0]
    eb = np.linspace(0.05, 0.5, data.size).reshape(data.shape) \
        .astype(np.float32)
    rec = direct.decompress(direct.compress(data, eb))
    assert np.all(np.abs(rec - data) <= eb)


def test_direct_rejects_nonpositive_bound(stack, direct):
    with pytest.raises(ValueError):
        direct.compress(stack[0], 0.0)


def test_delta_rejects_conflicting_rate_candidates(direct):
    """rate_candidates alongside an explicit direct compressor would be
    silently ignored; the constructor must refuse the combination."""
    with pytest.raises(ValueError, match="rate_candidates"):
        DeltaCompressor(direct=direct, rate_candidates=(1e-6, 1e-2))


@pytest.mark.parametrize("case", ["empty", "dense", "clustered", "uniform",
                                  "huge_gaps", "all"])
def test_patch_encoding_roundtrip(case):
    """Every candidate family of the exact-value patch coder round-trips
    and the smallest-wins selection stays decodable (the stack-B
    candidate-set contract, image_compression.py:138-276)."""
    npoints = 1 << 20
    rng = np.random.default_rng(3)
    idx = {
        "empty": np.zeros(0, np.int64),
        "dense": np.arange(0, npoints, 2, dtype=np.int64),
        "clustered": np.sort(rng.choice(4096, 1500, replace=False)
                             + np.int64(500000)),
        "uniform": np.sort(rng.choice(npoints, 2000, replace=False)
                           ).astype(np.int64),
        "huge_gaps": np.array([0, 1, 70000, 1000000], np.int64),
        "all": np.arange(npoints, dtype=np.int64),
    }[case]
    vals = rng.normal(size=len(idx)).astype(np.float32)
    buf = DirectCompressor._encode_patch(idx, vals, npoints)
    got_idx, got_vals, _ = DirectCompressor._decode_patch(buf, 0, npoints)
    np.testing.assert_array_equal(got_idx, idx)
    np.testing.assert_array_equal(got_vals, vals)


@pytest.mark.parametrize("method", [1, 2, 3, 4, 5])
def test_patch_encoding_each_method(method):
    """Force each encoding method through its own encode/decode pair."""
    import struct

    from ebcc_tpu.models import direct as _d
    npoints = 100000
    rng = np.random.default_rng(9)
    idx = np.sort(rng.choice(npoints, 700, replace=False)).astype(np.int64)
    vals = rng.normal(size=len(idx)).astype(np.float32)
    deltas = np.diff(idx, prepend=0)
    mask = np.zeros(npoints, bool)
    mask[idx] = True
    enc = {
        1: np.packbits(mask).tobytes(),
        2: DirectCompressor._varint_encode(deltas),
        3: idx.astype(np.uint32).tobytes(),
        4: DirectCompressor._encode_block(idx),
        5: DirectCompressor._encode_overflow(deltas),
    }[method]
    blob = _d._pack(enc + vals.tobytes())
    buf = struct.pack("<BII", method, len(idx), len(blob)) + blob
    got_idx, got_vals, _ = DirectCompressor._decode_patch(buf, 0, npoints)
    np.testing.assert_array_equal(got_idx, idx)
    np.testing.assert_array_equal(got_vals, vals)


def test_delta_chain(stack, direct):
    dc = DeltaCompressor(direct=direct)
    eb = np.full_like(stack, 0.1)
    blob = dc.compress(stack, eb)
    rec = dc.decompress(blob)
    assert rec.shape == stack.shape
    assert np.all(np.abs(rec - stack) <= eb)


def test_predictive_chain(stack, direct):
    pc = PredictiveCompressor(warmup=1, direct=direct)
    eb = np.full_like(stack, 0.1)
    blob = pc.compress(stack, eb)
    rec = pc.decompress(blob)
    assert np.all(np.abs(rec - stack) <= eb)


def test_predictive_custom_model(stack, direct):
    calls = []

    def linear_extrap(history):
        calls.append(len(history))
        if len(history) >= 2:
            return 2 * history[-1] - history[-2]
        return history[-1]

    pc = PredictiveCompressor(forecast_fn=linear_extrap, warmup=2,
                              direct=direct)
    eb = np.full_like(stack, 0.2)
    rec = pc.decompress(pc.compress(stack, eb))
    assert np.all(np.abs(rec - stack) <= eb)
    assert calls  # the model was actually consulted


def test_delta_chain_rate_optimized(stack):
    """Per-slice rate optimisation (reference: every delta slice is
    golden-section-optimised, image_compression_delta.py:63-75).  The
    default quantile is among the candidates, so the per-slice minimum
    can never lose to the fixed-quantile chain; the hard bound and the
    encoder/decoder state contract must survive the sweep."""
    cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=50,
                     max_batch=1)
    eb = np.full_like(stack, 0.1)
    from ebcc_tpu.api import base_error_quantile
    qs = (base_error_quantile(), 1e-3, 1e-1)
    plain = DeltaCompressor(direct=DirectCompressor(config=cfg))
    opt = DeltaCompressor(direct=DirectCompressor(config=cfg,
                                                  rate_candidates=qs))
    blob_plain = plain.compress(stack, eb)
    blob_opt = opt.compress(stack, eb)
    rec = opt.decompress(blob_opt)
    assert np.all(np.abs(rec - stack) <= eb)
    assert len(blob_opt) <= len(blob_plain)


def test_direct_rate_optimized_rec_contract(stack):
    """compress_with_rec under rate_candidates must still return the
    decoder-exact reconstruction (the chain compressors rely on it)."""
    cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=50,
                     max_batch=1)
    dc = DirectCompressor(config=cfg, rate_candidates=(1e-6, 1e-2))
    eb = np.full_like(stack[0], 0.1)
    blob, rec = dc.compress_with_rec(stack[0], eb)
    np.testing.assert_array_equal(rec, dc.decompress(blob))
    assert np.all(np.abs(rec - stack[0]) <= eb)


def test_rate_optimizer(stack):
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.1, base_cr=50,
                     max_batch=1)
    ro = RateOptimizedCompressor(cfg, candidates=(0.0, 1e-4, 1e-2))
    blob, info = ro.compress(stack[0])
    rec = ro.decompress(blob).reshape(stack[0].shape)
    assert np.max(np.abs(rec - stack[0])) <= 0.1
    assert info["candidate_sizes"][info["best_quantile"]] == len(blob)
    assert min(info["candidate_sizes"].values()) == len(blob)


def test_multi_q_identical_to_per_q(stack):
    """compress_multi_q (one dispatch for all candidates) must emit
    blobs bit-identical to compressing each candidate separately."""
    from ebcc_tpu import api
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.1, base_cr=50,
                     max_batch=1)
    qs = (0.0, 1e-2)
    blobs = api.compress_multi_q(stack[0], qs, cfg)
    for q, b in zip(qs, blobs):
        assert b == api.compress(stack[0], cfg, qbase=q)


class TestLearnedForecaster:
    """Predictive mode with an actually TRAINED model (the reference's
    Aurora pipeline role, run_aurora.py:163-330)."""

    @pytest.fixture(scope="class")
    def advecting(self):
        """Advecting high-frequency texture: the persistence residual is
        full-spectrum and codes badly, while a small conv can learn the
        3-pixel shift almost exactly — the regime where a learned
        forecaster pays (the reference's Aurora premise)."""
        h, w, t = 48, 64, 12
        rng = np.random.default_rng(5)
        texture = rng.normal(0, 2.0, (h, w)).astype(np.float32)
        y, x = np.mgrid[0:h, 0:w]
        base = (260 + 10 * np.sin(y / h * np.pi)).astype(np.float32)
        frames = [base + np.roll(texture, 3 * k, axis=1)
                  for k in range(t)]
        return np.stack(frames).astype(np.float32)

    def test_trained_model_predictive_compression(self, advecting):
        from ebcc_tpu.models import forecast
        if not forecast.HAVE_FLAX:
            pytest.skip("flax unavailable")
        train, test = advecting[:9], advecting
        params, meta = forecast.train_forecaster(
            train, warmup=2, features=8, steps=150, seed=0)
        fn = forecast.make_forecast_fn(params, meta)
        # the trained model must beat persistence on a held-out step
        pred = fn([test[9], test[10]])
        mse_model = float(np.mean((pred - test[11]) ** 2))
        mse_persist = float(np.mean((test[10] - test[11]) ** 2))
        assert mse_model < 0.5 * mse_persist, (mse_model, mse_persist)

        cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=50,
                         max_batch=1)
        direct = DirectCompressor(config=cfg)
        eb = np.full_like(test, 0.05)
        pc_model = PredictiveCompressor(forecast_fn=fn, warmup=2,
                                        direct=direct)
        blob = pc_model.compress(test, eb)
        rec = pc_model.decompress(blob)
        assert np.all(np.abs(rec - test) <= eb)
        # and the better forecasts must translate into a smaller stream
        pc_persist = PredictiveCompressor(warmup=2, direct=direct)
        blob_persist = pc_persist.compress(test, eb)
        assert len(blob) < len(blob_persist), \
            (len(blob), len(blob_persist))

    def test_params_roundtrip(self, advecting):
        from ebcc_tpu.models import forecast
        if not forecast.HAVE_FLAX:
            pytest.skip("flax unavailable")
        params, meta = forecast.train_forecaster(
            advecting[:6], warmup=2, features=4, steps=20, seed=1)
        blob = forecast.save_params(params, meta)
        params2, meta2 = forecast.load_params(blob, advecting.shape[1:])
        fn1 = forecast.make_forecast_fn(params, meta)
        fn2 = forecast.make_forecast_fn(params2, meta2)
        h = [advecting[6], advecting[7]]
        np.testing.assert_array_equal(fn1(h), fn2(h))


def test_patch_rejects_oversized_header():
    """A corrupt patch header (nfail > npoints or blob length past the
    buffer) must fail loudly, not size a multi-GB allocation."""
    import struct
    bad = struct.pack("<BII", 2, 2**31, 8) + b"\x00" * 8
    with pytest.raises(ValueError, match="corrupt patch header"):
        DirectCompressor._decode_patch(bad, 0, 1000)
    bad2 = struct.pack("<BII", 2, 10, 2**30) + b"\x00" * 8
    with pytest.raises(ValueError, match="corrupt patch header"):
        DirectCompressor._decode_patch(bad2, 0, 1000)


def test_patch_rejects_out_of_range_indices():
    """Corrupt patches whose decoded indices leave [0, npoints) must fail
    loudly — negative int64 indices would otherwise write through numpy
    wraparound into unrelated points."""
    import struct

    from ebcc_tpu.models import direct as _d
    for forged in (np.array([-5], np.int64), np.array([1000], np.int64)):
        payload = forged.tobytes() + np.float32(99.0).tobytes()
        blob = _d._pack(payload)
        buf = struct.pack("<BII", 0, 1, len(blob)) + blob
        with pytest.raises(ValueError, match="index out of range"):
            DirectCompressor._decode_patch(buf, 0, 1000)
