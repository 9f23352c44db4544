"""Format v4: chunk-masked last-plane truncation, end to end.

The mask is the encoder's largest CR lever over pure prefix truncation
(6-9% of the base stream on ERA5 fields, scripts/stripe_adaptive_study.py);
these tests pin the whole contract: the bound still holds on every decode
backend, the mask never loses to the prefix (CR monotonicity), v3 streams
stay readable, and malformed mask headers are rejected.
"""

import dataclasses
import struct

import numpy as np
import pytest

pytest.importorskip("jax")

from ebcc_tpu import api
from ebcc_tpu.codec import container
from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.runtime import native as _native


@pytest.fixture(scope="module")
def field():
    """ERA5 fixture when available (the mask's win is measured there);
    synthetic fallback otherwise (every property except the strict size
    win still holds)."""
    try:
        base = np.load("/root/reference/data/test_data.npy").astype(
            np.float32)[:360, :720]
    except Exception:
        y, x = np.mgrid[0:360, 0:720]
        base = (260 + 25 * np.sin(y / 360 * np.pi) *
                np.cos(x / 720 * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(7)
    return (base + rng.normal(0, 0.05, base.shape).astype(np.float32))[None]


def _cfg(**kw):
    kw.setdefault("mode", ResidualMode.MAX_ERROR)
    kw.setdefault("error", 0.5)
    kw.setdefault("base_cr", 100)
    kw.setdefault("max_batch", 1)
    kw.setdefault("encode_backend", "device")
    kw.setdefault("decode_backend", "device")
    return EBCCConfig(**kw)


def test_mask_improves_cr_and_holds_bound(field):
    cfg_off = _cfg(use_chunk_mask=False)
    cfg_on = _cfg(use_chunk_mask=True)
    blob_off = api.compress(field, cfg_off)
    blob_on = api.compress(field, cfg_on)
    # the mask is only chosen when strictly shorter than the prefix
    assert len(blob_on) <= len(blob_off)
    for cfg, blob in ((cfg_off, blob_off), (cfg_on, blob_on)):
        dec = api.decompress(blob, cfg)
        assert np.abs(dec - field).max() <= 0.5
    # the ERA5 field's last plane is compressible by masking: a real win,
    # and the winning variant carries the mask in its header
    import os
    if os.path.exists("/root/reference/data/test_data.npy"):
        assert len(blob_on) < len(blob_off)
        hdr = container.unpack_frame(container.unpack_blob(blob_on)[0])[0]
        assert (hdr.base_mask_plane != container.MASK_NONE or
                hdr.resid_mask_plane != container.MASK_NONE)


def test_masked_blob_decodes_on_every_backend(field):
    blob = api.compress(field, _cfg(use_chunk_mask=True))
    dec_dev = api.decompress(blob, _cfg(decode_backend="device"))
    assert np.abs(dec_dev - field).max() <= 0.5
    if _native.HAVE_NATIVE:
        from ebcc_tpu.runtime import cpu_decoder
        dec_cpu = cpu_decoder.decompress(blob)
        assert np.abs(dec_cpu - field).max() <= 0.5 + 1e-3
        # scalar and BMI2 native decoders agree bit for bit
        try:
            _native.force_coder_path(1)
            dec_s = cpu_decoder.decompress(blob)
        finally:
            _native.force_coder_path(0)
        np.testing.assert_array_equal(dec_s, dec_cpu)


def test_pointwise_masked_bound(field):
    eb = np.full(field.shape, 0.4, np.float32)
    eb[:, 100:180, 200:400] = 0.05  # spatially varying bound
    cfg = _cfg(mode=ResidualMode.POINTWISE_MAX_ERROR,
               use_chunk_mask=True)
    blob = api.compress(field, cfg, error_bound=eb)
    dec = api.decompress(blob, cfg)
    assert (np.abs(dec - field) <= eb).all()


def test_v3_stream_still_decodes(field):
    """A v4 reader accepts v3 frames (no mask fields)."""
    blob = api.compress(field, _cfg(use_chunk_mask=False))
    frames = container.unpack_blob(blob)
    hdr = container.unpack_frame(frames[0])[0]
    # rewrite the frame as v3: drop the 3 mask bytes from the fixed header
    # (and from the residual part if present)
    f = bytearray(frames[0])
    assert f[4] == container.VERSION
    f[4] = 3
    hdr_len = container._HDR.size
    v3 = bytes(f[:hdr_len - 3])
    off = hdr_len
    if hdr.flags & container.FLAG_RESID:
        res_len = container._RES.size
        v3 += bytes(f[off:off + res_len - 3])
        off += res_len
        v3 += bytes(f[off:off + hdr.zlen])
        off += hdr.zlen
    v3 += bytes(f[off:])
    hdr3 = container.unpack_frame(v3)[0]
    assert hdr3.base_mask_plane == container.MASK_NONE
    blob3 = container.pack_blob([v3])
    dec = api.decompress(blob3, _cfg(decode_backend="device"))
    assert np.abs(dec - field).max() <= 0.5
    if _native.HAVE_NATIVE:
        from ebcc_tpu.runtime import cpu_decoder
        dec_cpu = cpu_decoder.decompress(blob3)
        assert np.abs(dec_cpu - field).max() <= 0.5 + 1e-3


def test_corrupt_mask_plane_rejected(field):
    """mask_plane >= nplanes must fail loudly, not mis-decode."""
    blob = api.compress(field, _cfg(use_chunk_mask=False))
    frames = container.unpack_blob(blob)
    f = bytearray(frames[0])
    f[38] = 29  # base_mask_plane > base_nplanes (22)
    struct.pack_into("<H", f, 39, 0x3)
    bad = container.pack_blob([bytes(f)])
    with pytest.raises(ValueError):
        api.decompress(bad, _cfg(decode_backend="device"))
    if _native.HAVE_NATIVE:
        from ebcc_tpu.runtime import cpu_decoder
        with pytest.raises(ValueError):
            cpu_decoder.decompress(bad)


def test_multi_q_masked_identical_to_per_q(field):
    """compress_multi_q shares one masked base arena across candidates and
    must equal per-candidate compress() byte for byte."""
    qs = [1e-6, 1e-4]
    cfg = _cfg(use_chunk_mask=True)
    blobs = api.compress_multi_q(field, qs, cfg)
    for q, b in zip(qs, blobs):
        single = api.compress(field, cfg, qbase=q)
        assert b == single, f"q={q}"


def test_union_mask_search_cross_backend(era5_frame):
    """mask_search="union" (the batched device rule): byte-identical
    across backends, bound held, and the decoder needs no knowledge of
    which rule picked the mask (format v4 semantics are rule-free)."""
    import dataclasses

    import ebcc_tpu
    from ebcc_tpu.runtime import cpu_encoder

    rng = np.random.default_rng(7)
    crop = era5_frame[:96, :160]
    d = np.stack([crop + rng.normal(0, 0.3, crop.shape).astype(np.float32)
                  for _ in range(3)])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                     max_batch=3, mask_search="union",
                     encode_backend="device")
    blob = ebcc_tpu.compress(d, cfg)
    blob_cpu = cpu_encoder.compress(
        d, dataclasses.replace(cfg, encode_backend="cpu"))
    assert blob == blob_cpu
    rec = ebcc_tpu.decompress(blob, cfg)
    assert np.abs(rec - d).max() <= 0.5
