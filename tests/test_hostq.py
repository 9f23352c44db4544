"""Host-quantised (hostq) encode path: u16 planes cross the link instead
of f32 frames (api._scale_u16_host + pipeline._hostq_prelude).

The contract under test: the host-side quantisation is bit-identical to
the pipeline's own u16 scaling, the returned maxq genuinely bounds the
quantisation error, and the end-to-end bound on the ORIGINAL data holds
through the tightened targets (triangle inequality).  Byte-identity of
api.compress (which now routes through hostq) with the native CPU encoder
is enforced by tests/test_cpu_encoder.py.
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import EBCCConfig, ResidualMode, api
from ebcc_tpu.codec.pipeline import FrameCodec
from ebcc_tpu.runtime import native


def _numpy_scale(frames):
    """The numpy fallback of api._scale_u16_host, used as the oracle."""
    mn = frames.min(axis=(-2, -1))
    mx = frames.max(axis=(-2, -1))
    rng = mx - mn
    safe = np.where(rng > 0, rng, np.float32(1.0))
    y = np.trunc(np.clip(
        (frames - mn[:, None, None]) / safe[:, None, None]
        * np.float32(65535.0), np.float32(0.0), np.float32(65535.0)))
    return y.astype(np.uint16), mn, mx


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(7)
    h, w = 72, 104
    yy, xx = np.mgrid[0:h, 0:w]
    base = (260 + 25 * np.sin(yy / h * np.pi) *
            np.cos(xx / w * 2 * np.pi)).astype(np.float32)
    return np.stack([base + rng.normal(0, 0.3, base.shape)
                     for _ in range(3)]).astype(np.float32)


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="native lib not built")
def test_native_scale_matches_numpy(stack):
    u_n, mn_n, mx_n, maxq_n = native.scale_u16_batch(stack)
    u_p, mn_p, mx_p = _numpy_scale(stack)
    np.testing.assert_array_equal(u_n, u_p)
    np.testing.assert_array_equal(mn_n, mn_p)
    np.testing.assert_array_equal(mx_n, mx_p)
    assert maxq_n.dtype == np.float32 and (maxq_n > 0).all()


def test_maxq_bounds_quantisation_error(stack):
    """maxq must upper-bound |x - dequantise(u)| however the dequantise
    is rounded — checked against the float64 (exactly-rounded) reference
    with room to spare for a couple of f32 ulps of backend drift."""
    u, mn, mx, maxq = api._scale_u16_host(stack)
    rng = (mx - mn).astype(np.float64)
    dq64 = (u.astype(np.float64) / 65535.0 * rng[:, None, None]
            + mn.astype(np.float64)[:, None, None])
    err = np.abs(stack.astype(np.float64) - dq64).max(axis=(-2, -1))
    ulp = np.maximum(np.abs(mn), np.abs(mx)).astype(np.float64) * 2.0**-23
    assert (err + 2 * ulp <= maxq.astype(np.float64)).all(), (err, maxq)


def test_hostq_coefficients_match_f32_entry(stack):
    """The u16 plane computed on host must reproduce the device pipeline's
    own scaling exactly: identical quantised base coefficients."""
    b, h, w = stack.shape
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, max_batch=b)
    codec = FrameCodec(h, w, cfg)
    t = np.full(b, 0.5, np.float32)
    res_f32 = codec.encode_error_bounded(stack, t, 1e-6)
    u, mn, mx, maxq = api._scale_u16_host(stack)
    res_hq, meta = codec.encode_error_bounded_hostq(u, mn, mx, t - maxq,
                                                    1e-6)
    # the packed-metadata transfer must invert exactly
    unpacked = api._unpack_meta(meta, codec.base.spec.nchunks)
    for name, v in unpacked.items():
        np.testing.assert_array_equal(
            v, np.asarray(getattr(res_hq, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(res_f32.base_coef),
                                  np.asarray(res_hq.base_coef))
    np.testing.assert_array_equal(np.asarray(res_f32.mn),
                                  np.asarray(res_hq.mn))
    np.testing.assert_array_equal(np.asarray(res_f32.max_step_b),
                                  np.asarray(res_hq.max_step_b))


@pytest.mark.parametrize("mode,err", [
    (ResidualMode.MAX_ERROR, 0.01),
    (ResidualMode.MAX_ERROR, 0.5),
    (ResidualMode.RELATIVE_ERROR, 1e-4),
])
def test_bound_on_original_data(stack, mode, err):
    """The user bound applies to the ORIGINAL f32 data even though the
    encoder's error reference is the u16-dequantised field."""
    cfg = EBCCConfig(mode=mode, error=err, max_batch=stack.shape[0])
    blob = ebcc_tpu.compress(stack, cfg)
    rec = ebcc_tpu.decompress(blob, cfg)
    bound = err if mode == ResidualMode.MAX_ERROR else \
        err * (stack.max(axis=(-2, -1)) - stack.min(axis=(-2, -1)))
    e = np.abs(rec.reshape(stack.shape) - stack).max(axis=(-2, -1))
    assert (e <= bound + 1e-12).all(), (e, bound)


def test_bound_below_quantum_still_encodes(stack):
    """A bound smaller than the u16 quantisation error makes every frame
    infeasible after tightening; the encoder must still emit its best
    effort (pure-base/deep truncation) without crashing."""
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=1e-6,
                     max_batch=stack.shape[0])
    blob = ebcc_tpu.compress(stack, cfg)
    rec = ebcc_tpu.decompress(blob, cfg)
    # best achievable is ~the quantisation step; just sanity-bound it
    quantum = (stack.max() - stack.min()) / 65535.0
    assert np.abs(rec.reshape(stack.shape) - stack).max() <= 4 * quantum
