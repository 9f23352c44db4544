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


class TestDecidePureAdversarial:
    """Adversarially structured residuals (VERDICT r4 item 6).

    The 2/5 margin assumes zstd never compresses a residual bitplane
    stream beyond 2.5x.  Structured residuals CAN pass that ratio (a pure
    1-D wave measures ~2.65x), so these tests drive the rule with inputs
    built to break it: compressible low-rank residuals, and periodic
    spike grids tuned (via a coarse quantile) to push the margin usage
    toward its boundary.  In every case the fast path's bytes must equal
    the exact post-zstd comparison's.  The hunt that produced these
    fixtures also exposed the dangling-tail-bit bug (streams trimmed out
    of a longer arena carried the arena's next bits in their final byte —
    fixed by api._mask_tail + the native pack_variant mirror); the
    "harmonic" case is its regression test.
    """

    H, W = 96, 160

    @classmethod
    def _smooth(cls):
        y, x = np.mgrid[0:cls.H, 0:cls.W]
        return (260 + 25 * np.sin(y / cls.H * np.pi) *
                np.cos(x / cls.W * 2 * np.pi)).astype(np.float32)

    def _check(self, d, qbase, monkeypatch, expect_fired=None):
        data = d[None].astype(np.float32)
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5,
                         base_cr=100, max_batch=1, encode_backend="device")
        seen = {}
        orig = api._decide_pure

        def spy(res, mode):
            out = orig(res, mode)
            seen["fired"] = bool(out[0])
            return out

        monkeypatch.setattr(api, "_decide_pure", spy)
        fast = ebcc_tpu.compress(data, cfg, qbase=qbase)
        monkeypatch.setattr(
            api, "_decide_pure",
            lambda res, mode: np.zeros(np.asarray(res["const"]).shape,
                                       bool))
        exact = ebcc_tpu.compress(data, cfg, qbase=qbase)
        monkeypatch.setattr(api, "_decide_pure", orig)
        assert fast == exact
        rec = ebcc_tpu.decompress(fast, cfg)
        assert np.max(np.abs(rec - data)) <= 0.5
        if expect_fired is not None:
            assert seen["fired"] == expect_fired
        return seen["fired"]

    def test_compressible_wave_residual(self, monkeypatch):
        # residual constant along x -> stream zstd ratio ~2.65x (> 2.5):
        # the margin's stated assumption fails, but the decision is still
        # byte-correct (extra pure bits stay far below the margin)
        y = np.mgrid[0:self.H, 0:self.W][0]
        d = self._smooth() + (0.7 * np.sin(y / self.H * 50 * np.pi)
                              ).astype(np.float32)
        self._check(d, 1e-3, monkeypatch, expect_fired=True)

    def test_harmonic_residual_tail_bits_regression(self, monkeypatch):
        # before the _mask_tail fix the decided-pure stream's final byte
        # differed from the exact comparison's (shorter arena -> different
        # dangling bits -> different zstd bytes)
        y, x = np.mgrid[0:self.H, 0:self.W]
        d = self._smooth() + (0.8 * np.sin(y / self.H * 21 * np.pi) *
                              np.sin(x / self.W * 17 * np.pi)
                              ).astype(np.float32)
        self._check(d, 1e-3, monkeypatch, expect_fired=True)

    def test_margin_boundary_periodic_spikes(self, monkeypatch):
        # periodic identical spikes + coarse quantile: q hides many
        # spikes, pure pays for them -> margin usage ~0.9 of the 2/5
        # threshold, the closest measured approach; bytes must still match
        d = self._smooth()
        d[::6, ::6] += 20.0
        self._check(d, 0.01, monkeypatch, expect_fired=True)

    def test_margin_abstains_past_threshold(self, monkeypatch):
        # denser grid pushes the pure upgrade past the margin -> the rule
        # must abstain and fall through to the exact comparison
        d = self._smooth()
        d[::4, ::4] += 20.0
        self._check(d, 0.01, monkeypatch, expect_fired=False)
