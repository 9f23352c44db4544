"""Pallas fused level-0 segment counts: bit-exact parity with the jnp path.

The kernel (ops/pallas_kernels.py) is a scheduling change only — these
tests run it in interpret mode on the CPU mesh and require exact equality
with the reference jnp formulation, including the assembled [B, P, S]
layout the native coders mirror.  Mosaic compilation itself is exercised
on the real chip (scripts/pallas_ab.py; BENCHMARKS.md records the A/B).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ebcc_tpu.ops import bitplane as bp
from ebcc_tpu.ops import pallas_kernels as pk


def _random_analysis(spec, b=3, seed=0, scale=2000):
    rng = np.random.default_rng(seed)
    coefs = rng.integers(-scale, scale, (b, spec.height, spec.width))
    # sprinkle structured zeros so whole subtrees go insignificant
    coefs[:, ::2] = 0
    coefs[0] = 0  # all-zero frame: msb == -1 everywhere
    return bp.analyze(jnp.asarray(coefs, jnp.int32), spec)


@pytest.mark.parametrize("h,w,g,j", [(64, 96, 4, 8), (32, 32, 3, 4),
                                     (48, 80, 2, 8)])
def test_level0_counts_match_jnp(h, w, g, j):
    spec = bp.CoderSpec(height=h, width=w, group_levels=g, nplanes=13,
                        nchunks=j)
    an = _random_analysis(spec)
    ref = bp.segment_counts(an, spec)
    out = bp.segment_counts(an, spec, use_pallas=True, pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_level0_kernel_raw_layout():
    spec = bp.CoderSpec(height=32, width=64, group_levels=3, nplanes=9,
                        nchunks=4)
    an = _random_analysis(spec, b=2, seed=1)
    par = jnp.repeat(jnp.repeat(an.smax[1], 2, -1), 2, -2)
    k0 = np.asarray(pk.level0_counts(an.msb, par, spec.nplanes,
                                     spec.nchunks, interpret=True))
    assert k0.shape == (2, 4, 9, 3)
    msb = np.asarray(an.msb)
    parn = np.asarray(par)
    sid = np.asarray(bp.stripe_id(spec))
    for jj in (0, 3):
        for p in (0, 5, 8):
            m = sid == jj
            assert k0[1, jj, p, 0] == np.sum((parn[1] >= p) &
                                             (msb[1] <= p) & m)
            assert k0[1, jj, p, 1] == np.sum((msb[1] == p) & m)
            assert k0[1, jj, p, 2] == np.sum((msb[1] > p) & m)


def test_unsupported_geometry_falls_back():
    # hp not divisible by J: the flag must silently use the jnp path
    spec = bp.CoderSpec(height=36, width=64, group_levels=2, nplanes=9,
                        nchunks=8)
    an = _random_analysis(spec, b=2, seed=2)
    ref = bp.segment_counts(an, spec)
    out = bp.segment_counts(an, spec, use_pallas=True, pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_streams_identical_with_flag(small_frame):
    """End-to-end: the config flag changes scheduling, never bytes."""
    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode

    data = np.stack([small_frame, small_frame * 1.02])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=60,
                     max_batch=2, encode_backend="device",
                     use_pallas_counts=False)
    blob0 = ebcc_tpu.compress(data, cfg)
    cfgp = dataclasses.replace(cfg, use_pallas_counts=True)
    blob1 = ebcc_tpu.compress(data, cfgp)
    assert blob0 == blob1
    rec = ebcc_tpu.decompress(blob1, cfgp)
    assert float(np.abs(rec - data).max()) <= 0.5
