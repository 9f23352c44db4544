"""Sparse base-coefficient transfer must be byte-identical to dense.

The sparse (delta, value) form is a pure transfer optimisation: the native
coder reconstructs the same coefficient plane, so blobs must match the
dense-path blobs exactly.
"""

import numpy as np
import pytest

import ebcc_tpu
import ebcc_tpu.api as api
from ebcc_tpu import EBCCConfig, ResidualMode
from ebcc_tpu.codec.pipeline import FrameCodec
from ebcc_tpu.runtime import native

if not native.HAVE_NATIVE:  # pragma: no cover
    pytest.skip("native runtime not built", allow_module_level=True)

H, W = 128, 256


@pytest.fixture(scope="module")
def smooth():
    """Very smooth field at a loose bound -> few coded planes -> sparse."""
    y, x = np.mgrid[0:H, 0:W]
    base = (260 + 25 * np.sin(y / H * np.pi) *
            np.cos(x / W * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(3)
    return np.stack([base + rng.normal(0, 0.02, base.shape)
                     .astype(np.float32) for _ in range(2)])


def test_sparse_blob_equals_dense_blob(smooth):
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=2.0, base_cr=100,
                     max_batch=2)
    codec = FrameCodec(H, W, cfg)
    res = codec.encode_error_bounded(smooth, np.full(2, 2.0, np.float32),
                                     1e-6)
    if not np.asarray(res.base_sparse_ok).all():
        pytest.skip("sparse form not applicable at this size/bound")

    blob = ebcc_tpu.compress(smooth, cfg)
    rec = ebcc_tpu.decompress(blob, cfg)
    assert float(np.max(np.abs(rec - smooth))) <= 2.0

    orig = api._fetch_coef

    def force_dense(res_, rd, layer):
        if layer == "base":
            return ("dense", np.asarray(rd["base_pack16"]),
                    res_["base_shift"])
        return orig(res_, rd, layer)

    api._fetch_coef = force_dense
    try:
        blob_dense = ebcc_tpu.compress(smooth, cfg)
    finally:
        api._fetch_coef = orig
    assert blob == blob_dense


def test_sparsify_roundtrip_exact():
    """Device sparsify -> native expansion reproduces the packed plane."""
    import jax.numpy as jnp
    cfg = EBCCConfig(max_batch=2)
    codec = FrameCodec(H, W, cfg)
    rng = np.random.default_rng(1)
    p16 = np.zeros((2, codec.base.hp, codec.base.wp), np.uint16)
    # sparse scatter of values incl. sign bits
    for b in range(2):
        n = 500 + 300 * b
        ys = rng.integers(0, codec.base.hp, n)
        xs = rng.integers(0, codec.base.wp, n)
        p16[b, ys, xs] = rng.integers(1, 1 << 15, n).astype(np.uint16) | \
            (rng.integers(0, 2, n).astype(np.uint16) << 15)
    d, v, nsig, ok = codec._sparsify(jnp.asarray(p16),
                                     jnp.ones(2, bool))
    d, v, nsig = np.asarray(d), np.asarray(v), np.asarray(nsig)
    assert np.asarray(ok).all()
    for b in range(2):
        pos = np.cumsum(d[b][: nsig[b]].astype(np.int64))
        rebuilt = np.zeros(codec.base.hp * codec.base.wp, np.uint16)
        rebuilt[pos] = v[b][: nsig[b]]
        assert np.array_equal(rebuilt.reshape(codec.base.hp, codec.base.wp),
                              p16[b])


@pytest.fixture(scope="module")
def noisy():
    """Smooth field with localized spikes: at a loose base quantile the
    residual layer codes (mostly) the spikes -> few nonzero residual
    coefficients -> the sparse transfer form applies."""
    y, x = np.mgrid[0:H, 0:W]
    base = (260 + 25 * np.sin(y / H * np.pi) *
            np.cos(x / W * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(7)
    frames = np.stack([base, base * 1.001]).astype(np.float32)
    for b in range(2):
        ys = rng.integers(0, H, 40)
        xs = rng.integers(0, W, 40)
        frames[b, ys, xs] += rng.choice([-2.0, 2.0], 40).astype(np.float32)
    return frames


def test_resid_sparse_blob_equals_dense_blob(noisy):
    """The residual sparse transfer (round-3 d2h shrink) is a pure transfer
    optimisation: containers must match the dense-u8/u16 path byte for
    byte, and the encode result must actually exercise the sparse form."""
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=150,
                     max_batch=2, encode_backend="device")
    # a loose base quantile (2% of points may violate at the base layer)
    # forces the residual layer to carry the correction
    qbase = 0.02
    codec = FrameCodec(H, W, cfg)
    res = codec.encode_error_bounded(noisy, np.full(2, 0.5, np.float32),
                                     qbase)
    keeps_resid = ~(np.asarray(res.skip_residual) |
                    ~np.asarray(res.resid_feasible))
    if not keeps_resid.any():
        pytest.skip("residual layer not kept at this size/bound")
    if not np.asarray(res.resid_sparse_ok).all():
        pytest.skip("residual sparse form not applicable here")
    assert int(np.asarray(res.resid_nsig).max()) > 0

    blob = ebcc_tpu.compress(noisy, cfg, qbase=qbase)
    rec = ebcc_tpu.decompress(blob, cfg)
    assert float(np.max(np.abs(rec - noisy))) <= 0.5

    orig = api._fetch_coef

    def force_dense(res_, rd, layer):
        if layer == "resid":
            form = ("pack8" if res_["resid_pack8_ok"].all() else "pack16")
            shift = res_["resid_shift8" if form == "pack8"
                         else "resid_shift"]
            return ("dense", np.asarray(rd[f"resid_{form}"]), shift)
        return orig(res_, rd, layer)

    api._fetch_coef = force_dense
    try:
        blob_dense = ebcc_tpu.compress(noisy, cfg, qbase=qbase)
    finally:
        api._fetch_coef = orig
    assert blob == blob_dense


def test_sparse_bucket_trim_is_lossless():
    """Bucketed fetch trimming never cuts populated entries."""
    assert api._sparse_bucket(0, 100_000) == 4096
    assert api._sparse_bucket(4096, 100_000) == 4096
    assert api._sparse_bucket(4097, 100_000) == 8192
    assert api._sparse_bucket(70_000, 100_000) == 73_728
    assert api._sparse_bucket(99_999, 100_000) == 100_000
    for kmax in (0, 1, 4096, 8192, 8193, 70_000, 141_312):
        k = api._sparse_bucket(kmax, 141_312)
        assert kmax <= k <= 141_312


def test_sparsify_matches_sort_formulation():
    """The cumsum+searchsorted compaction (round 5: replaces the [B, n]
    device sort that dominated the packing stage) is IDENTICAL to the
    original sort-of-keys formulation, including past-the-cap, all-zero
    and over-u16-gap frames."""
    import jax
    import jax.numpy as jnp
    cfg = EBCCConfig(max_batch=3)
    codec = FrameCodec(H, W, cfg)
    n = codec.base.hp * codec.base.wp
    k = codec.base_sparse_k
    rng = np.random.default_rng(11)
    for density in (0.0, 0.02, 0.3):
        p = np.zeros((3, codec.base.hp, codec.base.wp), np.uint16)
        m = rng.random(p.shape) < density
        p[m] = rng.integers(1, 65535, m.sum()).astype(np.uint16)
        d1, v1, ns1, ok1 = jax.jit(codec._sparsify)(jnp.asarray(p),
                                                    jnp.ones(3, bool))
        flat = p.reshape(3, -1)
        keys = np.where(flat != 0, np.arange(n)[None], n)
        pos = np.sort(keys, axis=-1)[:, :k]
        delta = np.concatenate([pos[:, :1], pos[:, 1:] - pos[:, :-1]], 1)
        nsig = (flat != 0).sum(-1)
        valid = np.arange(k)[None] < nsig[:, None]
        vals = np.take_along_axis(flat, np.minimum(pos, n - 1), axis=-1)
        gaps_ok = np.all(np.where(valid, delta, 0) <= 65535, axis=-1)
        np.testing.assert_array_equal(
            np.asarray(d1), np.where(valid, delta, 0).astype(np.uint16))
        np.testing.assert_array_equal(
            np.asarray(v1), np.where(valid, vals, 0).astype(np.uint16))
        np.testing.assert_array_equal(np.asarray(ns1), nsig)
        np.testing.assert_array_equal(np.asarray(ok1),
                                      (nsig <= k) & gaps_ok)
