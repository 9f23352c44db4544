"""On-chip A/B of the chunk-mask search rule (config.mask_search).

Measures the device-only error-bounded encode (the hostq entry api.compress
dispatches) with the greedy scan vs the batched "union" rule, plus the CR
delta, at the bench config.  The greedy rule's three J-deep serial scans
are the dominant post-v4 device cost; the union rule collapses their
serial depth to 2.  Run on the real chip:

    python scripts/mask_ab.py

Prints one JSON line per rule + a summary.  Device sync is by scalar
fetch (jax.block_until_ready does not synchronise axon tunnel arrays).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from ebcc_tpu.utils import health

    if not health.probe_backend():
        print("device backend unreachable; this A/B needs a live device",
              file=sys.stderr)
        return 1
    health.enable_compile_cache()
    import jax.numpy as jnp

    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode, api

    B, H, W = int(os.environ.get("EBCC_BENCH_BATCH", "16")), 721, 1440
    rng = np.random.default_rng(0)
    try:
        base = np.load("/root/reference/data/test_data.npy").astype(
            np.float32)
    except Exception:
        y, x = np.mgrid[0:H, 0:W]
        base = (260 + 25 * np.sin(y / H * np.pi) *
                np.cos(x / W * 2 * np.pi)).astype(np.float32)
    data = np.stack([base + rng.normal(0, 0.05, base.shape)
                     .astype(np.float32) for _ in range(B)])

    out = {}
    for rule in ("greedy", "union"):
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5,
                         base_cr=100, max_batch=B, mask_search=rule)
        codec = api._codec_for(H, W, cfg)
        u, mnb, mxb, maxq = api._scale_u16_host(data)
        dev_u = jnp.asarray(u)
        dev_mn, dev_mx = jnp.asarray(mnb), jnp.asarray(mxb)
        target = jnp.asarray(np.full(B, 0.5, np.float32) - maxq)
        res, _ = codec.encode_error_bounded_hostq(dev_u, dev_mn, dev_mx,
                                                  target, 1e-6)
        float(jnp.sum(res.base_bits_q))  # compile + sync
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            res, _ = codec.encode_error_bounded_hostq(
                dev_u, dev_mn, dev_mx, target, 1e-6)
            float(jnp.sum(res.base_bits_q))
            best = min(best, time.perf_counter() - t0)
        # CR via the full pipeline (device encode backend)
        blob = ebcc_tpu.compress(
            data, dataclasses.replace(cfg, encode_backend="device"))
        rec = ebcc_tpu.decompress(blob, cfg)
        maxerr = float(np.abs(rec - data).max())
        assert maxerr <= 0.5, maxerr
        out[rule] = dict(rule=rule, device_encode_s=round(best, 4),
                         pts_per_s=round(B * H * W / best, 1),
                         cr=round(data.nbytes / len(blob), 3),
                         maxerr=round(maxerr, 4))
        print(json.dumps(out[rule]))
    g, un = out["greedy"], out["union"]
    print(json.dumps({
        "speedup_union_vs_greedy": round(
            g["device_encode_s"] / un["device_encode_s"], 3),
        "cr_delta_pct": round((g["cr"] / un["cr"] - 1) * 100, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
