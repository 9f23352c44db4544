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
