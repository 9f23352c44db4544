"""Native host coder must be bit-exact with the JAX reference packer.

The JAX packer (ops/bitplane.py) defines the stream format; the native coder
(native/ebcc_coder.cc) is the production entropy stage.  Any byte difference
is a bug in one of them.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ebcc_tpu.ops import bitplane as bp
from ebcc_tpu.runtime import native

if not native.HAVE_NATIVE:  # pragma: no cover
    pytest.skip("native runtime not built", allow_module_level=True)

H, W, G, P, J = 32, 64, 4, 12, 4
SPEC = bp.CoderSpec(height=H, width=W, group_levels=G, nplanes=P, nchunks=J)
CAP_WORDS = (H * W * 16 + 31) // 32


@pytest.fixture(scope="module")
def coefs():
    rng = np.random.default_rng(3)
    c = rng.laplace(0, 30, (4, H, W)).astype(np.int32)
    c[1] = 0                      # all-zero frame
    c[2, ::7, ::5] = 2047         # sparse large coefficients
    return c


@pytest.fixture(scope="module")
def packed(coefs):
    counts = bp.segment_counts(bp.analyze(jnp.asarray(coefs), SPEC), SPEC)
    _, totals = bp.offsets_from_counts(counts)
    totals = np.asarray(totals)
    words, tot, ms = bp.encode_batch(jnp.asarray(coefs),
                                     jnp.asarray(totals, jnp.int32),
                                     SPEC, CAP_WORDS)
    return totals, np.asarray(words), np.asarray(ms)


def test_encode_bit_exact(coefs, packed):
    totals, words, _ = packed
    arena = native.coder_encode_batch(coefs, totals.astype(np.int64),
                                      G, P, J)
    for i in range(len(coefs)):
        nb = (int(totals[i]) + 7) // 8
        jax_bytes = words[i].astype(">u4").tobytes()[:nb]
        assert arena[i, :nb].tobytes() == jax_bytes, f"frame {i}"


def test_decode_matches_jax_at_truncations(coefs, packed):
    totals, words, ms = packed
    full = [words[i].astype(">u4").tobytes()[: (int(totals[i]) + 7) // 8]
            for i in range(len(coefs))]
    for frac in (1.0, 0.4, 0.05):
        nb = (totals * frac).astype(np.int64)
        streams = [full[i][: (int(nb[i]) + 7) // 8]
                   for i in range(len(coefs))]
        dn = native.coder_decode_batch(streams, nb, ms, H, W, G, P, J)
        ww = np.zeros((len(coefs), CAP_WORDS), np.uint32)
        for i, s in enumerate(streams):
            v = np.frombuffer(s + b"\0" * (-len(s) % 4), ">u4")
            ww[i, : len(v)] = v
        dj = np.asarray(bp.decode_batch(jnp.asarray(ww),
                                        jnp.asarray(nb, jnp.int32),
                                        jnp.asarray(ms), SPEC))
        assert np.array_equal(dn, dj), f"frac={frac}"


def test_fast_and_scalar_coders_identical(coefs, packed):
    """The BMI2 word-parallel coder must be bit-identical with the scalar
    coder (which in turn matches the JAX packer)."""
    totals, words, ms = packed
    trunc = totals.astype(np.int64)
    try:
        native.force_coder_path(1)
        enc_s = native.coder_encode_batch(coefs, trunc, G, P, J)
        native.force_coder_path(2)
        enc_f = native.coder_encode_batch(coefs, trunc, G, P, J)
        assert np.array_equal(enc_s, enc_f)
        streams = [enc_f[i, : (int(totals[i]) + 7) // 8].tobytes()
                   for i in range(len(coefs))]
        nb = (totals * 0.6).astype(np.int64)
        native.force_coder_path(1)
        dec_s = native.coder_decode_batch(streams, nb, ms, H, W, G, P, J)
        native.force_coder_path(2)
        dec_f = native.coder_decode_batch(streams, nb, ms, H, W, G, P, J)
        assert np.array_equal(dec_s, dec_f)
    finally:
        native.force_coder_path(0)


def test_roundtrip_full_stream_is_lossless_ints(coefs, packed):
    """At full stream length the midpoint reconstruction equals the
    integer coefficients exactly (uncertainty interval is empty)."""
    totals, words, ms = packed
    streams = [words[i].astype(">u4").tobytes()[: (int(totals[i]) + 7) // 8]
               for i in range(len(coefs))]
    dn = native.coder_decode_batch(streams, totals.astype(np.int64), ms,
                                   H, W, G, P, J)
    assert np.array_equal(dn, coefs.astype(np.float32))


def test_masked_decode_matches_jax_and_closed_form(coefs, packed):
    """Chunk-masked streams (format v4): the native decoders (scalar AND
    BMI2) reproduce the JAX masked decode and the closed-form masked
    reconstruction, in both f32 and u16 output forms."""
    totals, words, ms = packed
    an = bp.analyze(jnp.asarray(coefs), SPEC)
    counts = bp.segment_counts(an, SPEC)
    bstar = 3
    bs = np.full(len(coefs), bstar, np.int32)
    segs = np.asarray(bp.mask_segments(counts, bs, SPEC))
    for keep in (0b0101, 0b1000, 0b0001):
        drop = np.array([not (keep >> j) & 1 for j in range(J)])
        ref = np.asarray(bp.recon_masked(
            an, bs, jnp.asarray(np.tile(drop, (len(coefs), 1))), SPEC))
        streams, nb = [], np.zeros(len(coefs), np.int64)
        for i in range(len(coefs)):
            full = words[i].astype(">u4").tobytes()
            sb, nbits = bp.splice_masked_stream(full, segs[i], keep, J)
            streams.append(sb)
            nb[i] = nbits
        mp = np.full(len(coefs), bstar, np.int32)
        km = np.full(len(coefs), keep, np.uint32)
        try:
            for path in (1, 2):
                native.force_coder_path(path)
                dn = native.coder_decode_batch(streams, nb, ms, H, W, G, P,
                                               J, mask_plane=mp,
                                               keep_mask=km)
                assert np.array_equal(dn, ref), f"path={path} keep={keep:b}"
                v16, bend, ok = native.coder_decode_batch_u16(
                    streams, nb, ms, H, W, G, P, J, mask_plane=mp,
                    keep_mask=km)
                for i in range(len(coefs)):
                    if not ok[i]:
                        continue
                    v = v16[i].astype(np.int64)
                    mag = (v & 0x3FFF) << bend[i]
                    last = bend[i] + ((v >> 14) & 1)
                    half = np.where((mag > 0) & (last > 0),
                                    (2.0 ** last - 1.0) * 0.5, 0.0)
                    rec = np.where(mag > 0, mag + half, 0.0)
                    rec = np.where((v & 0x8000) != 0, -rec, rec)
                    assert np.array_equal(rec.astype(np.float32),
                                          ref[i]), f"u16 frame {i}"
        finally:
            native.force_coder_path(0)
        # JAX word-buffer decode of the SAME spliced bytes
        ww = np.zeros((len(coefs), CAP_WORDS), np.uint32)
        for i, s in enumerate(streams):
            v = np.frombuffer(s + b"\0" * (-len(s) % 4), ">u4")
            ww[i, : len(v)] = v
        dj = np.asarray(bp.decode_batch(
            jnp.asarray(ww), jnp.asarray(nb, jnp.int32), jnp.asarray(ms),
            SPEC, mask_plane=jnp.asarray(mp),
            keep_mask=jnp.asarray(km.astype(np.int32))))
        assert np.array_equal(dj, ref), f"jax keep={keep:b}"
