"""Mosaic probe round 2: stride-2 via trivial reshape + transpose-based
row lifting (round 1 showed direct stride-2 slicing does not lower, while
in-VMEM transpose does).

  q1  sublane even/odd split via (H/2, 2, W) reshape + mid-dim index,
      interleave back via concat + reshape  — the column-lifting shuffle
  q2  one full 2-D inverse level: col-lift, transpose, col-lift, transpose
  q3  the full 5-level inverse transform (scratch-ref in-place, q2 per level)

Timing: N-vs-1 XLA fori_loop delta (tunnel round trip cancels); each probe
also checks VALUES against the jnp reference (max |diff| printed — must be
exactly 0.0 for q2/q3 since the arithmetic order matches idwt2d/idwt1d_v).
Run: python scripts/pallas_idwt_probe2.py
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

    from ebcc_tpu.ops.dwt import ALPHA, BETA, DELTA, GAMMA, XI
    from ebcc_tpu.ops import dwt

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((HP, WP)).astype(np.float32))

    def split_even_odd_rows(x):
        """[H, W] -> (even, odd) [H/2, W] via trivial reshape."""
        h, w = x.shape
        x2 = x.reshape(h // 2, 2, w)
        return x2[:, 0, :], x2[:, 1, :]

    def merge_even_odd_rows(even, odd):
        h2, w = even.shape
        return jnp.concatenate(
            [even[:, None, :], odd[:, None, :]], axis=1).reshape(2 * h2, w)

    def lift_cols_v(x):
        """Inverse CDF 9/7 along axis 0 (bit-matches ops/dwt.idwt1d_v)."""
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
        return merge_even_odd_rows(even, odd)

    def idwt2d_vmem(x):
        """One 2-D inverse level: cols, then rows via transpose sandwich."""
        x = lift_cols_v(x)
        return lift_cols_v(x.T).T

    def q1(i_ref, o_ref):
        even, odd = split_even_odd_rows(i_ref[:])
        o_ref[:] = merge_even_odd_rows(even + 1.0, odd - 1.0)

    def q2(i_ref, o_ref):
        o_ref[:] = idwt2d_vmem(i_ref[:])

    def q3(i_ref, o_ref):
        o_ref[:] = i_ref[:]
        for i in range(4, -1, -1):
            hh, ww = HP >> i, WP >> i
            o_ref[:hh, :ww] = idwt2d_vmem(o_ref[:hh, :ww])

    def ref_q1(x):
        e, o = x[0::2, :], x[1::2, :]
        out = np.empty_like(x)
        out[0::2], out[1::2] = e + 1.0, o - 1.0
        return out

    def ref_q2(x):
        return np.asarray(dwt.idwt2d(jnp.asarray(x)[None])[0])

    def ref_q3(x):
        return np.asarray(
            dwt.idwt2d_multi(jnp.asarray(x)[None], 5)[0])

    def run(name, kernel, ref_fn):
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((HP, WP), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            got = np.asarray(jax.jit(f)(x0))
            want = ref_fn(np.asarray(x0))
            maxdiff = float(np.max(np.abs(got - want)))

            def loop(n):
                g = jax.jit(lambda v: jax.lax.fori_loop(
                    0, n, lambda i, a: f(a), v))
                float(jnp.sum(g(x0)))
                best = float("inf")
                for _ in range(6):
                    t0 = time.perf_counter()
                    float(jnp.sum(g(x0)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t = max((loop(NIT) - loop(1)) / (NIT - 1), 1e-9)
            print(json.dumps({"probe": name, "per_pass_s": round(t, 6),
                              "maxdiff": maxdiff}))
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(json.dumps({"probe": name, "error": msg}))

    run("q1_reshape_interleave", q1, ref_q1)
    run("q2_one_level", q2, ref_q2)
    run("q3_full_multi", q3, ref_q3)

    # reference XLA timing for the same op (q3's competitor): loop-delta
    # of idwt2d_multi on [1, HP, WP]
    def loop_x(n):
        g = jax.jit(lambda v: jax.lax.fori_loop(
            0, n, lambda i, a: dwt.idwt2d_multi(a, 5), v))
        x1 = x0[None]
        float(jnp.sum(g(x1)))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            float(jnp.sum(g(x1)))
            best = min(best, time.perf_counter() - t0)
        return best

    t = max((loop_x(NIT) - loop_x(1)) / (NIT - 1), 1e-9)
    print(json.dumps({"probe": "xla_idwt2d_multi_b1", "per_pass_s":
                      round(t, 6)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
