"""A/B measurement of the Pallas fused level-0 counts on the real chip.

Times (a) `segment_counts` alone, jnp vs Pallas, and (b) the full
error-bounded encode with `use_pallas_counts` off vs on, asserting the
containers are byte-identical.  Run on the TPU host; results go in
BENCHMARKS.md.  `jax.block_until_ready` does not synchronise axon tunnel
arrays — device work is timed by fetching a scalar (CLAUDE.md).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _best(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from ebcc_tpu.utils import health
    health.enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode
    from ebcc_tpu import api as _api
    from ebcc_tpu.ops import bitplane as bp

    b = int(os.environ.get("EBCC_BENCH_BATCH", "16"))
    try:
        base = np.load("/root/reference/data/test_data.npy").astype(
            np.float32)
    except Exception:
        y, x = np.mgrid[0:721, 0:1440]
        base = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(0)
    data = np.stack([base + rng.normal(0, 0.05, base.shape).astype(
        np.float32) for _ in range(b)])

    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                     max_batch=b, encode_backend="device",
                     use_pallas_counts=False)
    codec = _api._codec_for(721, 1440, cfg)
    spec = codec.base.spec
    print(f"backend={jax.default_backend()}  batch={b}  "
          f"base geom {spec.height}x{spec.width} P={spec.nplanes} "
          f"J={spec.nchunks}")

    # ---- (a) segment_counts in isolation ----
    dev = jnp.asarray(data)
    an = jax.jit(lambda d: bp.analyze(
        jnp.trunc(codec._base_transform(d)[4].astype(jnp.float32))
        .astype(jnp.int32), spec))(dev)
    f_jnp = jax.jit(lambda a: bp.segment_counts(a, spec))
    f_pal = jax.jit(lambda a: bp.segment_counts(a, spec, use_pallas=True))
    c0 = f_jnp(an)
    c1 = f_pal(an)
    assert np.array_equal(np.asarray(c0), np.asarray(c1)), \
        "pallas counts differ from jnp counts"
    _sync(c0), _sync(c1)  # warm
    t_jnp = _best(lambda: _sync(f_jnp(an)))
    t_pal = _best(lambda: _sync(f_pal(an)))
    print(f"segment_counts: jnp {t_jnp * 1e3:.1f} ms  "
          f"pallas {t_pal * 1e3:.1f} ms  ({t_jnp / t_pal:.2f}x)")

    # ---- (b) full encode A/B ----
    target = jnp.full((b,), 0.5, jnp.float32)

    def enc(c):
        return _api._codec_for(721, 1440, c).encode_error_bounded(
            dev, target, 1e-6)

    cfg_p = dataclasses.replace(cfg, use_pallas_counts=True)
    r0 = enc(cfg)
    _sync(r0.base_bits_q)
    r1 = enc(cfg_p)
    _sync(r1.base_bits_q)
    t0 = _best(lambda: _sync(enc(cfg).base_bits_q), reps=3)
    t1 = _best(lambda: _sync(enc(cfg_p).base_bits_q), reps=3)
    pts = b * 721 * 1440
    print(f"device encode: jnp {t0:.3f} s ({pts / t0 / 1e6:.1f} M pts/s)  "
          f"pallas {t1:.3f} s ({pts / t1 / 1e6:.1f} M pts/s)  "
          f"({t0 / t1:.2f}x)")

    blob0 = ebcc_tpu.compress(data[:4], dataclasses.replace(
        cfg, max_batch=4))
    blob1 = ebcc_tpu.compress(data[:4], dataclasses.replace(
        cfg_p, max_batch=4))
    assert blob0 == blob1, "containers differ with the pallas flag"
    print(f"containers byte-identical ({len(blob0)} B); A/B valid")


if __name__ == "__main__":
    main()
