"""Cross-backend bound contract.

The raw pointwise API must satisfy the user bound even when the blob is
encoded against one decoder's reconstruction and decoded by the other
(the two agree only to the last ulps of the f32 lifting; the encoder's
search margin — api.pointwise_targets — must absorb that drift).
Reference semantics: the eps margin of j2k_codec.h:842-845, which at
float32 was a no-op (`1 - 1e-8` == 1.0f); here the margin is one u16
quantum of the frame range.
"""

import dataclasses

import numpy as np
import pytest

from ebcc_tpu import api
from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.runtime import native as _native

pytestmark = pytest.mark.skipif(
    not _native.HAVE_NATIVE, reason="native runtime not built")


def _cfg(**kw):
    return EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, base_cr=100,
                      max_batch=2, **kw)


def test_pointwise_targets_margin_survives_f32(small_frame):
    """The margin must actually narrow the target at float32 (the
    reference's `ratio * (1 - 1e-8)` rounds to a bit-exact no-op)."""
    eb = np.full(small_frame.shape, 0.25, np.float32)
    t = api.pointwise_targets(small_frame[None], eb[None], 1.0)
    assert (t < eb[None]).all()
    # and by (about) one u16 quantum of the frame range
    q = (small_frame.max() - small_frame.min()) / 65535.0
    np.testing.assert_allclose(eb[None] - t, q, rtol=1e-3)


def test_degenerate_bound_floors_at_half(small_frame):
    """Bounds below ~2 quanta floor at t/2 instead of going non-positive."""
    eb = np.full(small_frame.shape, 1e-12, np.float32)
    t = api.pointwise_targets(small_frame[None], eb[None], 1.0)
    assert (t > 0).all()
    np.testing.assert_allclose(t, eb[None] * 0.5)


@pytest.mark.parametrize("bound", [0.5, 0.05])
def test_encode_device_decode_cpu_holds_raw_bound(small_frame, bound):
    """Encode with the jitted pipeline, decode with the native CPU
    decoder: the RAW user bound (not the margined target) must hold."""
    rng = np.random.default_rng(3)
    frames = np.stack([small_frame,
                       small_frame + rng.normal(0, 0.2, small_frame.shape)
                       .astype(np.float32)])
    eb = np.full(frames.shape, bound, np.float32)
    blob = api.compress(frames, _cfg(encode_backend="device"),
                        error_bound=eb)
    rec = api.decompress(blob, _cfg(decode_backend="cpu"))
    assert np.abs(rec - frames).max() <= bound


@pytest.mark.parametrize("bound", [0.5, 0.05])
def test_encode_cpu_decode_device_holds_raw_bound(small_frame, bound):
    """The opposite direction: native CPU encoder, jitted decoder."""
    frames = small_frame[None]
    eb = np.full(frames.shape, bound, np.float32)
    blob = api.compress(frames, _cfg(encode_backend="cpu"),
                        error_bound=eb)
    rec = api.decompress(blob, _cfg(decode_backend="device"))
    assert np.abs(rec - frames).max() <= bound


def test_direct_blob_records_backend(small_frame):
    """EBTE blobs pin the reconstruction backend the patch was built
    against; decoding honours it regardless of the local default."""
    from ebcc_tpu.models.direct import DirectCompressor, _MAGIC_E
    dc = DirectCompressor(base_cr=100)
    eb = np.full(small_frame.shape, 0.1, np.float32)
    blob = dc.compress(small_frame, eb)
    assert blob[:4] == _MAGIC_E
    # a decompressor constructed with the OTHER backend must still decode
    # with the recorded one (bound stays unconditional)
    other = "device" if dc.config.decode_backend == "cpu" else "cpu"
    dc2 = DirectCompressor(
        base_cr=100,
        config=dataclasses.replace(dc.config, decode_backend=other))
    rec = dc2.decompress(blob)
    assert np.abs(rec - small_frame).max() <= 0.1
    np.testing.assert_array_equal(rec, dc.decompress(blob))


def test_legacy_ebtd_blob_still_decodes(small_frame):
    """Round-2 blobs (magic EBTD, no backend byte) keep decoding."""
    import struct

    from ebcc_tpu.models.direct import DirectCompressor
    dc = DirectCompressor(base_cr=100)
    eb = np.full(small_frame.shape, 0.1, np.float32)
    data = small_frame
    blob = api.compress(data, dc.config, error_bound=eb)
    rec = api.decompress(blob, dc.config).reshape(data.shape)
    patched, _ = dc._assemble(data, eb, blob, rec)
    # rewrite the EBTE header as the legacy EBTD layout
    _, _, ndim, blen = struct.unpack_from("<4sBBQ", patched, 0)
    legacy = (struct.pack("<4sBQ", b"EBTD", ndim, blen) +
              patched[struct.calcsize("<4sBBQ"):])
    out = dc.decompress(legacy)
    assert np.abs(out - data).max() <= 0.1
