"""On-chip A/B of the fused Pallas candidate evaluation (use_pallas_eval).

Measures the device-only error-bounded encode with the jnp evaluation
path vs the VMEM-fused kernel (ops/pallas_eval.py), verifies the packed
device metadata AND the final container bytes are identical, and prints
one JSON line per arm.  Run on the real chip:

    python scripts/pallas_eval_ab.py

Device sync by scalar fetch (axon arrays ignore block_until_ready).
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

    u, mnb, mxb, maxq = api._scale_u16_host(data)
    du = jnp.asarray(u)
    dmn, dmx = jnp.asarray(mnb), jnp.asarray(mxb)
    tgt = jnp.asarray(np.full(B, 0.5, np.float32) - maxq)

    metas, blobs, times = {}, {}, {}
    for flag in (False, True):
        cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5,
                         base_cr=100, max_batch=B, use_pallas_eval=flag,
                         encode_backend="device")
        codec = api._codec_for(H, W, cfg)
        res, meta = codec.encode_error_bounded_hostq(du, dmn, dmx, tgt,
                                                     1e-6)
        float(jnp.sum(res.base_bits_q))  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res, meta = codec.encode_error_bounded_hostq(du, dmn, dmx, tgt,
                                                         1e-6)
            float(jnp.sum(res.base_bits_q))
            best = min(best, time.perf_counter() - t0)
        metas[flag] = np.asarray(meta)
        blobs[flag] = ebcc_tpu.compress(data, cfg)
        times[flag] = best
        print(json.dumps({
            "use_pallas_eval": flag, "device_encode_s": round(best, 4),
            "pts_per_s": round(B * H * W / best, 1),
            "blob_bytes": len(blobs[flag])}))

    meta_eq = bool(np.array_equal(metas[False], metas[True]))
    blob_eq = blobs[False] == blobs[True]
    print(json.dumps({
        "meta_identical": meta_eq, "container_identical": blob_eq,
        "speedup": round(times[False] / times[True], 3)}))
    return 0 if (meta_eq and blob_eq) else 2


if __name__ == "__main__":
    sys.exit(main())
