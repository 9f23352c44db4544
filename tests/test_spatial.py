"""Spatially-sharded codec (parallel/spatial.py).

The full error-bounded encode runs with frame rows split over the
``space`` mesh axis; the base layer and every truncation decision must be
BIT-IDENTICAL to the dense FrameCodec (the halo DWT is bit-exact and the
canonical permutation feeds the analysis identical arrays).  The residual
layer's coefficients may differ in last-ulp (its input is a reconstruction
whose fused inverse-lifting kernels compile differently under shard_map),
so the residual is validated by decisions + the bound, not bytes.
"""

import numpy as np
import pytest

from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.codec.pipeline import FrameCodec
from ebcc_tpu.parallel.mesh import make_mesh
from ebcc_tpu.parallel.spatial import SpatialFrameCodec, SpatialShardedCodec

H, W, B = 256, 160, 4


@pytest.fixture(scope="module")
def stack(era5_frame):
    rng = np.random.default_rng(3)
    base = era5_frame[:H, :W]
    return np.stack([base + rng.normal(0, 0.3, base.shape)
                     for _ in range(B)]).astype(np.float32)


@pytest.fixture(scope="module")
def spatial_result(stack):
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, max_batch=B)
    mesh = make_mesh(n_data=4, n_space=2)
    sc = SpatialShardedCodec(H, W, cfg, mesh)
    res = sc.encode_error_bounded(stack, np.full(B, 0.5, np.float32), 1e-6)
    return sc, res


def test_matches_dense_codec(stack, spatial_result):
    sc, res_sp = spatial_result
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, max_batch=B)
    dense = FrameCodec(H, W, cfg)
    res_d = dense.encode_error_bounded(stack, np.full(B, 0.5, np.float32),
                                       np.float32(1e-6))
    # base layer: bit-identical coefficients and selections — including
    # the format-v4 chunk-mask outputs (km/mbits/segs): the mask search's
    # greedy scan must reach identical verdicts under shard_map or the
    # emitted containers diverge from the dense codec's
    np.testing.assert_array_equal(np.asarray(res_sp.base_coef),
                                  np.asarray(res_d.base_coef))
    for f in ("mn", "mx", "dc_b", "max_step_b", "base_bits_q",
              "base_bits_pure", "base_feasible_pure", "bs_q", "ks_q",
              "bs_pure", "ks_pure", "skip_residual", "resid_feasible",
              "max_step_r", "km_q", "km_pure", "mbits_q", "mbits_pure",
              "segs_q", "segs_pure"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_sp, f)), np.asarray(getattr(res_d, f)),
            err_msg=f)
    # the fixture must actually exercise the mask path
    assert (np.asarray(res_sp.km_q) >= 0).any()
    # the residual layer's input is the base reconstruction, whose fused
    # inverse-lifting kernels compile differently under shard_map ->
    # last-ulp value drift: assert closeness, not bytes
    np.testing.assert_allclose(np.asarray(res_sp.rmin),
                               np.asarray(res_d.rmin), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_sp.rmax),
                               np.asarray(res_d.rmax), atol=1e-3)
    dr = np.abs(np.asarray(res_sp.resid_coef) -
                np.asarray(res_d.resid_coef))
    assert dr.max() <= 2.0  # +-1 quantisation step at trunc boundaries
    bits_sp = np.asarray(res_sp.resid_bits, np.float64)
    bits_d = np.asarray(res_d.resid_bits, np.float64)
    assert np.all(np.abs(bits_sp - bits_d) <= 0.1 * np.maximum(bits_d, 64))
    # residual v4 twins: same last-ulp drift allowance as resid_bits
    mb_sp = np.asarray(res_sp.mbits_r, np.float64)
    mb_d = np.asarray(res_d.mbits_r, np.float64)
    assert np.all(np.abs(mb_sp - mb_d) <= 0.1 * np.maximum(mb_d, 64))


def test_masked_stream_decodes(stack, spatial_result):
    """Format v4 end-to-end on the mesh: pack the prefix arena, splice the
    chunk-masked base stream (bp.splice_masked_stream, the normative
    layout), decode through the masked decode path, and check the bound.
    Covers the splice/segs/km agreement the selection test alone can't."""
    import jax.numpy as jnp

    from ebcc_tpu.ops import bitplane as bp
    sc, res = spatial_result
    km = np.asarray(res.km_q)
    skip = np.asarray(res.skip_residual)
    assert (km >= 0).any()
    segs = np.asarray(res.segs_q)
    trunc = np.where(km >= 0, segs.sum(-1), np.asarray(res.base_bits_q))
    spec = sc.codec.base.spec
    words, _, _ = bp.encode_batch(
        jnp.asarray(np.asarray(res.base_coef)),
        jnp.asarray(trunc, jnp.int32), spec, sc.codec.base.cap_words)
    words_np = np.asarray(words).copy()
    mbits = np.asarray(res.mbits_q)
    for i in range(B):
        if km[i] < 0:
            continue
        raw = words_np[i].astype(">u4").tobytes()[:(int(trunc[i]) + 7) // 8]
        sb, nbits = bp.splice_masked_stream(raw, segs[i], int(km[i]),
                                            spec.nchunks)
        assert nbits == int(mbits[i])
        buf = sb + b"\x00" * (-len(sb) % 4)
        wrow = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
        words_np[i] = 0
        words_np[i][:len(wrow)] = wrow[:words_np.shape[1]]
    mask_b = np.where(km >= 0, np.asarray(res.bs_q), -1).astype(np.int32)
    rc = bp.decode_batch(jnp.asarray(words_np),
                         jnp.asarray(np.where(km >= 0, mbits, trunc),
                                     jnp.int32),
                         jnp.asarray(np.asarray(res.max_step_b)), spec,
                         mask_plane=jnp.asarray(mask_b),
                         keep_mask=jnp.asarray(km, np.int32))
    out = np.asarray(sc.codec._base_recon(rc, jnp.asarray(res.mn),
                                          jnp.asarray(res.mx),
                                          jnp.asarray(res.dc_b)))
    sel = skip & (km >= 0)
    assert sel.any()
    assert np.abs(out[sel] - stack[sel]).max() <= 0.5


def test_bound_held_from_chosen_truncation(stack, spatial_result):
    """Reconstruction at the chosen truncation (== the decoded stream by
    the embedded-coder property) satisfies the bound."""
    import jax.numpy as jnp

    from ebcc_tpu.ops import bitplane as bp
    sc, res = spatial_result
    codec = sc.codec
    an_b = bp.analyze(jnp.asarray(np.asarray(res.base_coef), jnp.int32),
                      codec.base.spec)
    use_pure = ~res.skip_residual & ~res.resid_feasible
    bs = jnp.where(use_pure, res.bs_pure, res.bs_q)
    ks = jnp.where(use_pure, res.ks_pure, res.ks_q)
    rec = codec._base_recon(codec._recon_at(an_b, codec.base, bs, ks),
                            res.mn, res.mx, res.dc_b)
    an_r = bp.analyze(jnp.asarray(np.asarray(res.resid_coef), jnp.int32),
                      codec.resid.spec)
    rec_r = codec._resid_recon(
        codec._recon_at(an_r, codec.resid, res.bs_r, res.ks_r),
        res.rmin, res.rmax, res.dc_r)
    has_r = (~res.skip_residual & res.resid_feasible)[:, None, None]
    out = np.asarray(rec + jnp.where(has_r, rec_r, 0.0))
    assert np.abs(out - stack).max() <= 0.5


def test_rejects_unshardable_geometry():
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5)
    mesh = make_mesh(n_data=1, n_space=8)
    # 96 padded rows cannot give every one of 8 shards >= 4 rows at the
    # deepest of 5 levels
    with pytest.raises(ValueError):
        SpatialFrameCodec(96, 160, cfg, mesh)


def test_spatial_pointwise_targets(stack):
    """Pointwise (per-point) targets shard over the space axis too."""
    import jax.numpy as jnp

    from ebcc_tpu.ops import bitplane as bp
    cfg = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, max_batch=B)
    mesh = make_mesh(n_data=4, n_space=2)
    sc = SpatialShardedCodec(H, W, cfg, mesh)
    rng = np.random.default_rng(9)
    eb = rng.uniform(0.1, 0.6, stack.shape).astype(np.float32)
    res = sc.encode_error_bounded(stack, eb * (1 - 1e-8), 1e-6)
    codec = sc.codec
    an_b = bp.analyze(jnp.asarray(np.asarray(res.base_coef), jnp.int32),
                      codec.base.spec)
    use_pure = ~res.skip_residual & ~res.resid_feasible
    bs = jnp.where(use_pure, res.bs_pure, res.bs_q)
    ks = jnp.where(use_pure, res.ks_pure, res.ks_q)
    rec = codec._base_recon(codec._recon_at(an_b, codec.base, bs, ks),
                            res.mn, res.mx, res.dc_b)
    an_r = bp.analyze(jnp.asarray(np.asarray(res.resid_coef), jnp.int32),
                      codec.resid.spec)
    rec_r = codec._resid_recon(
        codec._recon_at(an_r, codec.resid, res.bs_r, res.ks_r),
        res.rmin, res.rmax, res.dc_r)
    has_r = (~res.skip_residual & res.resid_feasible)[:, None, None]
    out = np.asarray(rec + jnp.where(has_r, rec_r, 0.0))
    assert np.all(np.abs(out - stack) <= eb)
