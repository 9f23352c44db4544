"""Parity of the fused Pallas candidate evaluation (ops/pallas_eval.py)
with the jnp path it replaces.

The kernel replicates the jnp path's formulas op for op; remaining
differences are COMPILER artifacts, not algorithmic ones (XLA contracts
some multiply-adds into FMAs depending on fusion context, shifting the
lifting chain by ~1 ulp — the same effect already separates the jitted
pipeline from eager execution, and the reason the native encoder uses
std::fma in its scan rows).  The enforceable contract, asserted here:

* maxd / viol agree to last-ulp tolerance AND every feasibility
  decision (maxd <= 0, viol <= qallow) is identical, for truncation,
  fine-chunk and chunk-mask candidates, both layer kinds, scalar AND
  per-point (pointwise) targets;
* full containers are byte-identical with the flag on vs off in both
  MAX_ERROR and POINTWISE_MAX_ERROR modes.

Mosaic-vs-XLA agreement on hardware is verified end-to-end by the
on-chip A/B (scripts/pallas_eval_ab.py, results in BENCHMARKS.md).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ebcc_tpu
from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.codec.pipeline import FrameCodec
from ebcc_tpu.ops import bitplane as bp
from ebcc_tpu.ops import pallas_eval as pe

B, H, W = 2, 96, 160


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W]
    base = (260 + 25 * np.sin(y / H * np.pi) *
            np.cos(x / W * 2 * np.pi)).astype(np.float32)
    data = np.stack([base + rng.normal(0, 0.3, base.shape)
                     .astype(np.float32) for _ in range(B)])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.25, base_cr=200,
                     max_batch=B, use_pallas_eval=True)
    c = FrameCodec(H, W, cfg)
    dj = jnp.asarray(data)
    mn, mx, const, dc, ci = jax.jit(c._base_transform)(dj)
    an = bp.analyze(ci, c.base.spec)
    target = jnp.asarray(np.full(B, 0.25, np.float32))
    return c, dj, data, mn, mx, dc, ci, an, target


def _evals(setup):
    c, dj, data, mn, mx, dc, ci, an, target = setup

    def recon_b(rc):
        return c._base_recon(rc, mn, mx, dc)

    ev_k = c._make_eval(an, c.base, recon_b, dj, target, ci=ci,
                        kind="base", dc=dc, lo=mn, hi=mx)
    ev_j = c._make_eval(an, c.base, recon_b, dj, target)
    return ev_k, ev_j, c


def test_kernel_enabled_in_interpret_mode(setup):
    ev_k, ev_j, _ = _evals(setup)
    assert ev_k.kernel is not None and ev_k.kernel["interpret"]
    assert ev_j.kernel is None


def _assert_parity(stats_k, stats_j):
    mk, vk = (np.asarray(v) for v in stats_k)
    mj, vj = (np.asarray(v) for v in stats_j)
    np.testing.assert_allclose(mk, mj, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(vk, vj, rtol=1e-4, atol=2e-5)
    np.testing.assert_array_equal(mk <= 0, mj <= 0)
    for qa in (0.0, 1e-6, 1e-3):
        np.testing.assert_array_equal(vk <= qa, vj <= qa)


def test_trunc_candidates_parity(setup):
    ev_k, ev_j, c = _evals(setup)
    j = c.base.spec.nchunks
    for b in range(0, c.base.spec.nplanes, 5):
        bv = jnp.full(B, b, jnp.int32)
        _assert_parity(ev_k.trunc(bv), ev_j.trunc(bv))
    for k in (1, j, 2 * j - 1):
        js = jnp.full(B, min(k + 1, j) if k < j else j, jnp.int32)
        jr = jnp.full(B, 0 if k < j else k - j + 1, jnp.int32)
        bv = jnp.full(B, 5, jnp.int32)
        _assert_parity(ev_k.trunc(bv, js=js, jr=jr),
                       ev_j.trunc(bv, js=js, jr=jr))


def test_masked_candidates_parity(setup):
    ev_k, ev_j, c = _evals(setup)
    j = c.base.spec.nchunks
    rng = np.random.default_rng(3)
    for _ in range(2):
        drop = jnp.asarray(rng.random((B, j)) < 0.4)
        bv = jnp.full(B, 6, jnp.int32)
        _assert_parity(ev_k.masked(bv, drop), ev_j.masked_jnp(bv, drop))


def test_resid_kind_parity(setup):
    c, dj, data, mn, mx, dc, ci, an, target = setup

    def recon_b(rc):
        return c._base_recon(rc, mn, mx, dc)

    base_rec = recon_b(c._recon_at(an, c.base, jnp.full(B, 8, jnp.int32),
                                   jnp.full(B, 3, jnp.int32)))
    resid = dj - base_rec
    rmin, rmax, dcr, cir = jax.jit(c._resid_transform)(resid)
    an_r = bp.analyze(cir, c.resid.spec)

    def recon_r(rc):
        return base_rec + c._resid_recon(rc, rmin, rmax, dcr)

    ev_k = c._make_eval(an_r, c.resid, recon_r, dj, target, ci=cir,
                        kind="resid", dc=dcr, lo=rmin, hi=rmax,
                        base_rec=base_rec)
    ev_j = c._make_eval(an_r, c.resid, recon_r, dj, target)
    assert ev_k.kernel is not None
    for b in (0, 9):
        bv = jnp.full(B, b, jnp.int32)
        _assert_parity(ev_k.trunc(bv), ev_j.trunc(bv))


def test_container_byte_identity(setup):
    _, _, data, *_ = setup
    cfg0 = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.25, base_cr=200,
                      max_batch=B, use_pallas_eval=False,
                      encode_backend="device", decode_backend="device")
    cfg1 = dataclasses.replace(cfg0, use_pallas_eval=True)
    b0 = ebcc_tpu.compress(data, cfg0)
    b1 = ebcc_tpu.compress(data, cfg1)
    assert b0 == b1
    rec = ebcc_tpu.decompress(b1, cfg1)
    assert float(np.max(np.abs(rec - data))) <= 0.25


def test_pointwise_target_field_parity(setup):
    """Per-point target FIELDS route through the kernel's target-field
    variant (round 5: POINTWISE mode / DirectCompressor no longer falls
    back to the jnp path on TPU) with the same parity contract."""
    c, dj, data, mn, mx, dc, ci, an, _ = setup
    rng = np.random.default_rng(9)
    tgt3 = jnp.asarray(
        (0.2 + 0.2 * rng.random((B, H, W))).astype(np.float32))

    def recon_b(rc):
        return c._base_recon(rc, mn, mx, dc)

    ev_k = c._make_eval(an, c.base, recon_b, dj, tgt3, ci=ci, kind="base",
                        dc=dc, lo=mn, hi=mx)
    ev_j = c._make_eval(an, c.base, recon_b, dj, tgt3)
    assert ev_k.kernel is not None and ev_k.kernel["tgt_field"] is not None
    for b in (0, 6, 12):
        bv = jnp.full(B, b, jnp.int32)
        _assert_parity(ev_k.trunc(bv), ev_j.trunc(bv))
    drop = jnp.zeros((B, c.base.spec.nchunks), bool).at[:, 1].set(True)
    _assert_parity(ev_k.masked(jnp.full(B, 6, jnp.int32), drop),
                   ev_j.masked_jnp(jnp.full(B, 6, jnp.int32), drop))


def test_pointwise_container_byte_identity(setup):
    _, _, data, *_ = setup
    cfg0 = EBCCConfig(mode=ResidualMode.POINTWISE_MAX_ERROR, error=0.3,
                      base_cr=200, max_batch=B, use_pallas_eval=False,
                      encode_backend="device", decode_backend="device")
    cfg1 = dataclasses.replace(cfg0, use_pallas_eval=True)
    rng = np.random.default_rng(13)
    eb = (0.25 + 0.35 * rng.random(data.shape)).astype(np.float32)
    b0 = ebcc_tpu.compress(data, cfg0, error_bound=eb)
    b1 = ebcc_tpu.compress(data, cfg1, error_bound=eb)
    assert b0 == b1
    rec = ebcc_tpu.decompress(b1, cfg1)
    assert np.all(np.abs(rec - data) <= eb)


def test_supported_geometry_guard():
    assert pe.supported(768, 1472, 5)
    assert pe.supported(736, 1440, 3)
    assert not pe.supported(6, 1440, 3)  # level sub-shape under 4
