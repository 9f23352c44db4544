"""Bitplane coder tests: closed-form analysis vs actual encode/decode."""

import numpy as np
import jax.numpy as jnp

from ebcc_tpu.ops import bitplane as bp


def make_spec(h=32, w=64, g=3, nplanes=12, j=4):
    return bp.CoderSpec(height=h, width=w, group_levels=g, nplanes=nplanes,
                        nchunks=j)


def random_coefs(shape, rng, sparse=0.7, maxmag=500):
    mag = rng.integers(0, maxmag, size=shape)
    mask = rng.random(size=shape) > sparse
    sign = rng.choice([-1, 1], size=shape)
    return (mag * mask * sign).astype(np.int32)


def test_full_roundtrip_exact():
    """With the full stream, decode reproduces coefficients exactly."""
    rng = np.random.default_rng(3)
    spec = make_spec()
    coef = random_coefs((2, spec.height, spec.width), rng)
    cap_words = spec.height * spec.width  # generous
    trunc = jnp.full((2,), cap_words * 32, jnp.int32)
    words, total, max_step = bp.encode_batch(jnp.asarray(coef), trunc, spec,
                                             cap_words)
    assert int(jnp.max(total)) < cap_words * 32
    rec = bp.decode_batch(words, total, max_step, spec)
    np.testing.assert_array_equal(np.asarray(rec), coef.astype(np.float32))


def test_counts_match_emission():
    rng = np.random.default_rng(4)
    spec = make_spec()
    coef = random_coefs((3, spec.height, spec.width), rng)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    _, total_expected = bp.offsets_from_counts(counts)
    cap_words = spec.height * spec.width
    trunc = jnp.full((3,), cap_words * 32, jnp.int32)
    _, total, _ = bp.encode_batch(jnp.asarray(coef), trunc, spec, cap_words)
    np.testing.assert_array_equal(np.asarray(total),
                                  np.asarray(total_expected))


def test_truncated_decode_matches_closed_form_plane_boundaries():
    """Decoding a plane-boundary prefix equals the closed-form model."""
    rng = np.random.default_rng(5)
    spec = make_spec()
    coef = random_coefs((1, spec.height, spec.width), rng)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    plane_bits = bp.bits_at_plane_boundaries(counts)  # [1, P]
    cap_words = spec.height * spec.width
    for p in range(spec.nplanes - 4, spec.nplanes):
        b = spec.nplanes - 1 - p
        tb = plane_bits[:, p]
        words, total, max_step = bp.encode_batch(
            jnp.asarray(coef), tb, spec, cap_words)
        rec = bp.decode_batch(words, jnp.minimum(total, tb), max_step, spec)
        expected = bp.recon_truncated(an, jnp.full((1,), b, jnp.int32))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(expected),
                                   atol=1e-4)


def test_truncated_decode_matches_closed_form_chunk_candidates():
    """Every candidate truncation point decodes to its closed-form model."""
    rng = np.random.default_rng(8)
    spec = make_spec()
    coef = random_coefs((1, spec.height, spec.width), rng, maxmag=2000)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    cand = bp.candidate_bits(counts, spec)  # [1, P, 2J]
    cap_words = spec.height * spec.width
    j = spec.nchunks
    b = 2
    p = spec.nplanes - 1 - b
    for ci in range(2 * j):
        tb = cand[:, p, ci]
        words, total, max_step = bp.encode_batch(
            jnp.asarray(coef), tb, spec, cap_words)
        rec = bp.decode_batch(words, jnp.minimum(total, tb), max_step, spec)
        if ci < j:
            js, jr = ci + 1, 0
        else:
            js, jr = j, ci - j + 1
        expected = bp.recon_truncated(
            an, jnp.full((1,), b, jnp.int32),
            sig_chunks=jnp.full((1,), js, jnp.int32),
            refine_chunks=jnp.full((1,), jr, jnp.int32), spec=spec)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(expected), atol=1e-4,
            err_msg=f"candidate {ci}")


def test_truncated_error_bound():
    """After plane b, max reconstruction error < 2**b (midpoint recon)."""
    rng = np.random.default_rng(6)
    spec = make_spec()
    coef = random_coefs((1, spec.height, spec.width), rng, maxmag=2000)
    an = bp.analyze(jnp.asarray(coef), spec)
    for b in range(1, 8):
        rec = bp.recon_truncated(an, jnp.full((1,), b, jnp.int32))
        err = np.max(np.abs(np.asarray(rec) - coef))
        assert err < 2 ** b


def test_candidate_bits_monotone():
    rng = np.random.default_rng(7)
    spec = make_spec()
    coef = random_coefs((2, spec.height, spec.width), rng, maxmag=3000)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    cand = np.asarray(bp.candidate_bits(counts, spec)).reshape(2, -1)
    assert (np.diff(cand, axis=-1) >= 0).all()
    total = np.asarray(bp.offsets_from_counts(counts)[1])
    np.testing.assert_array_equal(cand[:, -1], total)


def test_zero_frame():
    spec = make_spec()
    coef = jnp.zeros((1, spec.height, spec.width), jnp.int32)
    cap_words = 1024
    trunc = jnp.full((1,), cap_words * 32, jnp.int32)
    words, total, max_step = bp.encode_batch(coef, trunc, spec, cap_words)
    rec = bp.decode_batch(words, total, max_step, spec)
    np.testing.assert_array_equal(np.asarray(rec), 0.0)


def _words_to_bytes(words, nbits):
    return np.asarray(words).astype(">u4").tobytes()[: (int(nbits) + 7) // 8]


def _bytes_to_words(stream, cap_words):
    buf = stream + b"\x00" * (-len(stream) % 4)
    w = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    out = np.zeros(cap_words, np.uint32)
    out[: len(w)] = w[:cap_words]
    return out


def test_masked_splice_decode_matches_closed_form():
    """Splicing dropped chunks out of the final plane and decoding with the
    chunk mask reproduces the closed-form masked reconstruction (format v4
    semantics)."""
    rng = np.random.default_rng(7)
    spec = make_spec()
    j = spec.nchunks
    coef = random_coefs((2, spec.height, spec.width), rng)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    cap_words = spec.height * spec.width
    trunc = jnp.full((2,), cap_words * 32, jnp.int32)
    words, total, max_step = bp.encode_batch(jnp.asarray(coef), trunc, spec,
                                             cap_words)
    words = np.asarray(words)
    for bstar in (2, 4, 6):
        bs = jnp.full((2,), bstar, jnp.int32)
        segs = np.asarray(bp.mask_segments(counts, bs, spec))
        for keep in (0b0101, 0b1110, 0b0001, 0b1111):
            drop = np.array([[not ((keep >> jj) & 1) for jj in range(j)]] * 2)
            expect = np.asarray(
                bp.recon_masked(an, bs, jnp.asarray(drop), spec))
            streams, nbits, mw = [], [], []
            for i in range(2):
                full = _words_to_bytes(
                    words[i], int(segs[i].sum()))  # through end of plane bs
                sb, nb = bp.splice_masked_stream(full, segs[i], keep, j)
                assert nb == int(segs[i, 0] + segs[i, 1]) + sum(
                    int(segs[i, 2 + jj] + segs[i, 2 + j + jj])
                    for jj in range(j) if (keep >> jj) & 1)
                streams.append(sb)
                nbits.append(nb)
                mw.append(_bytes_to_words(sb, cap_words))
            rec = bp.decode_batch(
                jnp.asarray(np.stack(mw)), jnp.asarray(nbits, jnp.int32),
                max_step, spec,
                mask_plane=jnp.full((2,), bstar, jnp.int32),
                keep_mask=jnp.full((2,), keep, jnp.int32))
            np.testing.assert_array_equal(np.asarray(rec), expect)


def test_masked_full_keep_equals_plane_boundary_decode():
    """keep_mask of all-ones degenerates to the plain plane-complete prefix."""
    rng = np.random.default_rng(8)
    spec = make_spec()
    coef = random_coefs((1, spec.height, spec.width), rng)
    an = bp.analyze(jnp.asarray(coef), spec)
    counts = bp.segment_counts(an, spec)
    cap_words = spec.height * spec.width
    trunc = jnp.full((1,), cap_words * 32, jnp.int32)
    words, _, max_step = bp.encode_batch(jnp.asarray(coef), trunc, spec,
                                         cap_words)
    bstar = 3
    bs = jnp.full((1,), bstar, jnp.int32)
    segs = np.asarray(bp.mask_segments(counts, bs, spec))
    nb = int(segs[0].sum())
    plain = bp.decode_batch(words, jnp.asarray([nb], jnp.int32), max_step,
                            spec)
    masked = bp.decode_batch(
        words, jnp.asarray([nb], jnp.int32), max_step, spec,
        mask_plane=jnp.full((1,), bstar, jnp.int32),
        keep_mask=jnp.full((1,), (1 << spec.nchunks) - 1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(masked))


def test_segment_counts_matches_mask_formulation():
    """The cumulative-histogram counts (round 5) are integer-identical to
    the per-plane mask formulation they replaced, across geometries
    including one whose stripes defeat the histogram reshape (the
    level-0 mask fallback)."""
    def ref_counts(an, spec):
        g, j = spec.group_levels, spec.nchunks
        sid = bp.stripe_id(spec)
        pb = bp._planes(spec)[:, None, None]

        def count(mask):
            return jnp.sum(mask, axis=(-2, -1), dtype=jnp.int32)

        segs = []
        for k in range(g, 0, -1):
            if k == g:
                par_ok = an.max_step[:, None, None, None] >= pb
            else:
                par_ok = bp._upsample2(an.smax[k + 1][:, None] >= pb)
            segs.append(count(par_ok & (an.smax[k][:, None] <= pb)))
        par0 = bp._upsample2(an.smax[1][:, None] >= pb)
        emit0 = par0 & (an.msb[:, None] <= pb)
        new = an.msb[:, None] == pb
        old = an.msb[:, None] > pb
        for jj in range(j):
            in_chunk = sid == jj
            segs.append(count(emit0 & in_chunk))
            segs.append(count(new & in_chunk))
        for jj in range(j):
            segs.append(count(old & (sid == jj)))
        return jnp.stack(segs, axis=-1)

    rng = np.random.default_rng(5)
    for (h, w, g, P, J) in [(64, 96, 4, 12, 8), (96, 64, 3, 10, 4),
                            (92, 96, 2, 8, 4)]:  # last: mask fallback
        spec = bp.CoderSpec(height=h, width=w, group_levels=g,
                            nplanes=P, nchunks=J)
        mags = (rng.integers(0, 1 << min(P, 15), (2, h, w)) *
                (rng.random((2, h, w)) < 0.4)).astype(np.int32)
        ci = jnp.asarray(
            mags * rng.choice([-1, 1], (2, h, w)).astype(np.int32))
        an = bp.analyze(ci, spec)
        np.testing.assert_array_equal(
            np.asarray(ref_counts(an, spec)),
            np.asarray(bp.segment_counts(an, spec)))
