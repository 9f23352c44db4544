"""The early pure-base decision (api._decide_pure).

The rule lets the encoder emit the pure variant without packing the
residual layer (the biggest d2h transfer + host zstd of the encode path).
These tests pin its two contracts:

* blobs are byte-identical to the exact post-zstd comparison whenever the
  rule fires (conservativeness — the decision never changes the output on
  data where it applies);
* the rule actually fires on the bench-shaped workload (so the fast path
  is the exercised one), and never on frames that keep their residual.

The native encoder mirrors the rule (native/ebcc_cpu_encoder.cc);
tests/test_cpu_encoder.py enforces cross-backend byte identity on top.
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import EBCCConfig, ResidualMode, api


def _noisy(frame, n, sigma, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([frame + rng.normal(0, sigma, frame.shape)
                     .astype(np.float32) for _ in range(n)])


@pytest.fixture()
def no_decide(monkeypatch):
    """Force every frame through the exact byte comparison."""
    monkeypatch.setattr(
        api, "_decide_pure",
        lambda res, mode: np.zeros(np.asarray(res["const"]).shape, bool))


class TestDecidePure:
    def test_blob_identical_to_exact_comparison(self, small_frame,
                                                monkeypatch):
        # bench-shaped: loose bound, residual packed but pure base wins
        # (qbase=1e-3 keeps the residual layer live on this small frame)
        data = _noisy(small_frame, 3, 0.05)
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                         max_batch=3, encode_backend="device")
        fast = ebcc_tpu.compress(data, cfg, qbase=1e-3)
        monkeypatch.setattr(
            api, "_decide_pure",
            lambda res, mode: np.zeros(np.asarray(res["const"]).shape, bool))
        exact = ebcc_tpu.compress(data, cfg, qbase=1e-3)
        assert fast == exact

    def test_rule_fires_on_loose_bounds(self, small_frame):
        data = _noisy(small_frame, 2, 0.05)
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                         max_batch=2)
        seen = {}
        orig = api._decide_pure

        def spy(res, mode):
            out = orig(res, mode)
            seen["decided"] = out
            return out

        import dataclasses
        api._decide_pure = spy
        try:
            blob = ebcc_tpu.compress(
                data, dataclasses.replace(cfg, encode_backend="device"),
                qbase=1e-3)
        finally:
            api._decide_pure = orig
        assert seen["decided"].all()
        rec = ebcc_tpu.decompress(blob, cfg)
        assert np.max(np.abs(rec - data)) <= 0.5

    def test_rule_abstains_when_pure_not_certain(self, small_frame,
                                                 monkeypatch):
        # coarse base quantile: pure costs far more base bits than the 2/5
        # margin allows, so the rule must abstain and leave those frames on
        # the exact byte comparison — and the result must equal the
        # comparison-only encoder's bit for bit
        data = _noisy(small_frame, 2, 0.05)
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.05,
                         base_cr=100, max_batch=2, encode_backend="device")
        seen = {}
        orig = api._decide_pure

        def spy(res, mode):
            out = orig(res, mode)
            seen["decided"] = out
            return out

        monkeypatch.setattr(api, "_decide_pure", spy)
        blob = ebcc_tpu.compress(data, cfg, qbase=0.1)
        assert not seen["decided"].any()
        monkeypatch.setattr(
            api, "_decide_pure",
            lambda res, mode: np.zeros(np.asarray(res["const"]).shape, bool))
        exact = ebcc_tpu.compress(data, cfg, qbase=0.1)
        assert blob == exact
        rec = ebcc_tpu.decompress(blob, cfg)
        assert np.max(np.abs(rec - data)) <= 0.05

    def test_decide_pure_requires_error_bounded_mode(self, small_frame):
        res = {"const": np.zeros(2, bool)}
        out = api._decide_pure(res, ResidualMode.NONE)
        assert not out.any()

    def test_exact_path_unchanged_when_undecided(self, small_frame,
                                                 no_decide):
        data = _noisy(small_frame, 2, 0.05)
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                         max_batch=2, encode_backend="device")
        blob = ebcc_tpu.compress(data, cfg)
        rec = ebcc_tpu.decompress(blob, cfg)
        assert np.max(np.abs(rec - data)) <= 0.5
