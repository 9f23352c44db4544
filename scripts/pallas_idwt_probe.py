"""Mosaic lowering + speed probe for the fused-eval kernel building blocks.

The planned round-5 kernel (VMEM-resident masked-recon + inverse lifting +
error reduce) needs ops whose Mosaic support cannot be verified off-chip
(round 3's counts kernel passed interpret mode and failed hardware
lowering).  This probe compiles and times each primitive on the real chip:

  p0  elementwise + full reduce            (known-good baseline)
  p1  sublane (axis-0) stride-2 slice + interleave (column lifting)
  p2  lane (axis-1) stride-2 slice + interleave    (row lifting)
  p3  in-VMEM transpose of the full frame
  p4  one full 2-D inverse lifting level in VMEM
  p5  the 5-level inverse transform in VMEM

Each is timed as the delta between N-iteration and 1-iteration XLA-level
fori_loops over the pallas_call (the ~30 ms tunnel round trip cancels).
Failures print the Mosaic error and continue.  Run: python scripts/pallas_idwt_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HP, WP = 768, 1472
NIT = 9


def lift_cols(x):
    """Inverse CDF 9/7 lifting along axis 0 of a [H, W] value."""
    from ebcc_tpu.ops.dwt import ALPHA, BETA, DELTA, GAMMA, XI
    import jax.numpy as jnp

    n2 = x.shape[0] // 2
    s = x[:n2, :] / XI
    d = x[n2:, :] * XI
    prev = lambda v: jnp.concatenate([v[1:2, :], v[:-1, :]], axis=0)
    nxt_r = lambda v: jnp.concatenate([v[1:, :], v[-2:-1, :]], axis=0)
    nxt_e = lambda v: jnp.concatenate([v[1:, :], v[-1:, :]], axis=0)
    s = s - DELTA * (d + prev(d))
    d = d - GAMMA * (s + nxt_r(s))
    even = s - BETA * (d + prev(d))
    odd = d - ALPHA * (even + nxt_e(even))
    out = jnp.stack([even, odd], axis=1)  # [n2, 2, W]
    return out.reshape(2 * n2, x.shape[1])


def lift_rows(x):
    """Inverse lifting along axis 1 of a [H, W] value."""
    from ebcc_tpu.ops.dwt import ALPHA, BETA, DELTA, GAMMA, XI
    import jax.numpy as jnp

    n2 = x.shape[1] // 2
    s = x[:, :n2] / XI
    d = x[:, n2:] * XI
    prev = lambda v: jnp.concatenate([v[:, 1:2], v[:, :-1]], axis=1)
    nxt_r = lambda v: jnp.concatenate([v[:, 1:], v[:, -2:-1]], axis=1)
    nxt_e = lambda v: jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
    s = s - DELTA * (d + prev(d))
    d = d - GAMMA * (s + nxt_r(s))
    even = s - BETA * (d + prev(d))
    odd = d - ALPHA * (even + nxt_e(even))
    out = jnp.stack([even, odd], axis=2)  # [H, n2, 2]
    return out.reshape(x.shape[0], 2 * n2)


def main():
    from ebcc_tpu.utils import health

    if not health.probe_backend():
        print("device unreachable", file=sys.stderr)
        return 1
    health.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((HP, WP)).astype(np.float32))

    def k0(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 1.0001 + 0.5

    def k1(i_ref, o_ref):
        x = i_ref[:]
        even = x[0::2, :]
        odd = x[1::2, :]
        out = jnp.stack([even + 1.0, odd - 1.0], axis=1)
        o_ref[:] = out.reshape(HP, WP)

    def k2(i_ref, o_ref):
        x = i_ref[:]
        even = x[:, 0::2]
        odd = x[:, 1::2]
        out = jnp.stack([even + 1.0, odd - 1.0], axis=2)
        o_ref[:] = out.reshape(HP, WP)

    def k3(i_ref, o_ref, scratch):
        scratch[:] = jnp.swapaxes(i_ref[:], 0, 1)
        o_ref[:] = jnp.swapaxes(scratch[:] * 1.0001, 0, 1)

    def k4(i_ref, o_ref):
        o_ref[:] = lift_rows(lift_cols(i_ref[:]))

    def k5(i_ref, o_ref):
        x = i_ref[:]
        for i in range(4, -1, -1):
            hh, ww = HP >> i, WP >> i
            sub = x[:hh, :ww]
            sub = lift_rows(lift_cols(sub))
            x = x.at[:hh, :ww].set(sub)
        o_ref[:] = x

    def run(name, kernel, scratch=None):
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=([pltpu.VMEM((WP, HP), jnp.float32)]
                                if scratch else []),
            )

            def loop(n):
                g = jax.jit(lambda v: jax.lax.fori_loop(
                    0, n, lambda i, a: f(a), v))
                float(jnp.sum(g(x0)))  # compile+warm
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(jnp.sum(g(x0)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t = max((loop(NIT) - loop(1)) / (NIT - 1), 1e-9)
            gbps = 2 * x0.nbytes / t / 1e9
            print(json.dumps({"probe": name, "per_pass_s": round(t, 6),
                              "eff_gbps": round(gbps, 2)}))
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(json.dumps({"probe": name, "error": msg}))

    run("p0_elementwise", k0)
    run("p1_sublane_interleave", k1)
    run("p2_lane_interleave", k2)
    run("p3_vmem_transpose", k3, scratch=True)
    run("p4_one_level_idwt2d", k4)
    run("p5_full_idwt2d_multi", k5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
