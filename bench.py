"""Benchmark: compress+decompress throughput at a fixed max-error bound.

Runs on whatever JAX platform is active (the real TPU chip under the
driver).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grid-points/s", "vs_baseline": N}

Baseline: the reference C filter is single-threaded per chunk and performs
~6-9 full OpenJPEG encode+decode probes plus ~15 SPIHT decode probes per
frame for the error-bound search (BASELINE.md; data/compress_logs.txt:7-29).
No throughput number is recorded in the reference repo, so the baseline here
is a *generous* estimate of 2.0e6 grid-points/s for single-core C
compress+decompress at these settings (OpenJPEG alone encodes ~5-20 Mpx/s
single-core; with ~8 re-encode probes + SPIHT passes the pipeline lands at
1-3 Mpx/s).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_GRID_POINTS_PER_S = 2.0e6


def _run_mode(mode: str, timeout_s: int):
    """One bench submode in a time-boxed subprocess; returns its JSON dict
    or None.  Tunnel-attached devices can hang mid-run, so every device
    attempt is isolated this way."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "EBCC_BENCH_MODE": mode},
            timeout=timeout_s, capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if r.returncode == 0 and lines:
            return json.loads(lines[-1])
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main():
    """Orchestrator: device benchmark in a TIME-BOXED subprocess, native-CPU
    fallback otherwise.  A tunnel-attached device can hang at backend init
    OR die mid-run; either way the driver must still get its JSON line.

    BUDGET-AWARE: the driver runs this under ``timeout 580``
    (EBCC_BENCH_BUDGET overrides).  Every attempt is sized from the budget
    actually remaining, and — because the tunnel recovers in bursts — a
    failed device attempt is RETRIED as the full wall bench once the probe
    comes back healthy, so a transient outage costs the round the weaker
    fallback wall only when the tunnel stays down the whole window.  The
    probe verdicts are always FRESH here (a stale cached "dead" from
    minutes ago must not poison the driver's one capture of the round).
    """
    from ebcc_tpu.utils import health

    mode = os.environ.get("EBCC_BENCH_MODE")
    if mode == "device":
        return run_bench(fallback_cpu=False)
    if mode == "cpu":
        return run_bench(fallback_cpu=True)
    if mode == "device_only":
        return run_device_only()

    budget = float(os.environ.get("EBCC_BENCH_BUDGET", "580"))
    t_start = time.monotonic()

    def remaining():
        return budget - (time.monotonic() - t_start) - 8.0  # print margin

    # first device box: leave room for the CPU fallback + one retry leg
    # (a healthy run finishes well inside this with a warm compile cache)
    out = None
    if health.probe_backend(use_cache=False, timeout_s=90):
        box1 = min(float(os.environ.get("EBCC_BENCH_DEVICE_TIMEOUT", "320")),
                   remaining() - 110)
        if box1 >= 120:
            out = _run_mode("device", int(box1))
        if out is None:
            # the device attempt failed or hung mid-run: record it so api
            # callers in the next few minutes skip the device too
            health.write_verdict(False)
    if out is not None:
        print(json.dumps(out))
        return 0

    cpu_out = None
    box_cpu = min(200.0, remaining() - 60)
    if box_cpu >= 60:
        cpu_out = _run_mode("cpu", int(box_cpu))

    # retry leg: the wall figure is what vs_baseline records, so when the
    # probe has recovered and the budget allows, re-attempt the FULL wall
    # bench (compile cache warm from the first attempt) before settling
    # for the device-only encode figure
    dev_out = None
    if health.probe_backend(use_cache=False, timeout_s=60):
        rem = remaining()
        if rem >= 120:
            dev_out = _run_mode("device", int(rem))
        if dev_out is None and remaining() >= 70:
            dev = _run_mode("device_only", int(remaining()))
            if dev and cpu_out is not None:
                cpu_out["device_encode_pts_per_s"] = \
                    dev["device_encode_pts_per_s"]
                cpu_out["metric"] += (
                    f" [device-only encode "
                    f"{dev['device_encode_pts_per_s'] / 1e6:.1f}M"
                    " pts/s measured post-fallback]")
            elif dev and cpu_out is None:
                cpu_out = dev
    if dev_out is not None:
        if cpu_out is not None:
            dev_out["metric"] += (" [device wall captured on retry after a "
                                  "transient outage; fallback wall "
                                  f"{cpu_out['value'] / 1e6:.2f}M pts/s]")
        print(json.dumps(dev_out))
        return 0
    if cpu_out is not None:
        print(json.dumps(cpu_out))
        return 0
    return run_bench(fallback_cpu=True)  # last resort: inline CPU bench


def run_device_only():
    """Measure ONLY the device-compute encode throughput (no wall pipeline).

    Used by the orchestrator when the full device bench failed or the wall
    number came from the CPU fallback: the device-only figure is the one a
    PCIe-local host would approach, and it should be recorded whenever the
    hardware answers at all.
    """
    from ebcc_tpu.utils import health
    health.enable_compile_cache()

    import jax.numpy as jnp

    from ebcc_tpu import EBCCConfig, ResidualMode
    from ebcc_tpu import api as _api

    frames_per_batch = int(os.environ.get("EBCC_BENCH_BATCH", "16"))
    try:
        base = np.load("/root/reference/data/test_data.npy").astype(
            np.float32)
    except Exception:
        y, x = np.mgrid[0:721, 0:1440]
        base = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(0)
    data = np.stack([base + rng.normal(0, 0.05, base.shape).astype(
        np.float32) for _ in range(frames_per_batch)])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                     max_batch=frames_per_batch)
    codec = _api._codec_for(721, 1440, cfg)
    # measure the hostq entry (api.compress's production path): u16 input
    # resident on device, targets pre-tightened by the quantisation error
    u, mnb, mxb, maxq = _api._scale_u16_host(data)
    dev_u = jnp.asarray(u)
    dev_mn, dev_mx = jnp.asarray(mnb), jnp.asarray(mxb)
    target = jnp.asarray(np.full(frames_per_batch, 0.5, np.float32) - maxq)
    res, _ = codec.encode_error_bounded_hostq(dev_u, dev_mn, dev_mx, target,
                                              1e-6)
    float(jnp.sum(res.base_bits_q))  # warm + sync (scalar fetch; see run_bench)
    dev_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res, _ = codec.encode_error_bounded_hostq(dev_u, dev_mn, dev_mx,
                                                  target, 1e-6)
        float(jnp.sum(res.base_bits_q))
        dev_best = min(dev_best, time.perf_counter() - t0)
    dev_pts_per_s = frames_per_batch * 721 * 1440 / dev_best
    print(json.dumps({
        "metric": "device-only encode grid-points/s @ max_error=0.5 "
                  f"(ERA5 721x1440, {frames_per_batch} frames)",
        "value": round(dev_pts_per_s, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(dev_pts_per_s / BASELINE_GRID_POINTS_PER_S, 3),
        "device_encode_pts_per_s": round(dev_pts_per_s, 1),
    }))
    return 0


def run_bench(fallback_cpu: bool):
    from ebcc_tpu.utils import health

    if fallback_cpu:
        # tunnel down: measure the native CPU codec instead of reporting
        # nothing (set BEFORE the backend initialises)
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if fallback_cpu:
        # env alone is not enough: jax read it at import, and the axon
        # register hook force-overrides jax_platforms anyway
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: repeated bench runs skip the multi-
    # minute pipeline compile (results unaffected; programs are keyed by
    # their HLO)
    health.enable_compile_cache()

    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode

    # batch 16 amortises the tunnelled host link's per-dispatch latency
    # (see BENCHMARKS.md); override with EBCC_BENCH_BATCH
    frames_per_batch = int(os.environ.get("EBCC_BENCH_BATCH", "16"))
    path = "/root/reference/data/test_data.npy"
    try:
        base = np.load(path).astype(np.float32)
    except Exception:
        y, x = np.mgrid[0:721, 0:1440]
        base = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(0)
    n_frames = 2 * frames_per_batch
    data = np.stack([base + rng.normal(0, 0.05, base.shape).astype(np.float32)
                     for _ in range(n_frames)])

    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.5, base_cr=100,
                     max_batch=frames_per_batch)
    import dataclasses
    if fallback_cpu:
        cfg = dataclasses.replace(cfg, encode_backend="cpu",
                                  decode_backend="cpu")
    else:
        # pin the device encode: "auto" would route the warmup (one batch,
        # error-bounded) through the native CPU encoder, leaving the
        # device pipeline uncompiled when the first timed rep hits it
        cfg = dataclasses.replace(cfg, encode_backend="device")

    # warmup: compile both directions
    blob = ebcc_tpu.compress(data[:frames_per_batch], cfg)
    rec = ebcc_tpu.decompress(blob, cfg)

    # best single run of up to 3 repetitions (one run's enc+dec together,
    # not a best-enc/best-dec composite no run achieved): the tunnelled
    # host<->device link of this dev setup has high run-to-run variance;
    # steady-state throughput is the honest figure for the pipeline.
    # Time-boxed so congested links can't blow the driver's timeout.
    best = None
    reps_t0 = time.perf_counter()
    for rep in range(3):
        t0 = time.perf_counter()
        blob = ebcc_tpu.compress(data, cfg)
        t1 = time.perf_counter()
        rec = ebcc_tpu.decompress(blob, cfg)
        t2 = time.perf_counter()
        if best is None or t2 - t0 < best[0]:
            best = (t2 - t0, t1 - t0, t2 - t1)
        if time.perf_counter() - reps_t0 > 150:
            break
    total, enc_s, dec_s = best

    # device-compute-only throughput of the encode analysis (transform +
    # embedded-coder truncation search), the wall metric's compute core.
    # This host's tunnel link dominates wall time (CLAUDE.md: device
    # compute <10% of wall); the device number is the figure a PCIe-local
    # host would approach.  jax.block_until_ready does not synchronise
    # axon tunnel arrays — sync by fetching a scalar.
    if fallback_cpu:
        dev_pts_per_s = 0.0
    else:
        import jax.numpy as jnp

        from ebcc_tpu import api as _api
        codec = _api._codec_for(721, 1440, cfg)
        # hostq entry (the wall path's device program): u16 input resident
        u, mnb, mxb, maxq = _api._scale_u16_host(data[:frames_per_batch])
        dev_u = jnp.asarray(u)
        dev_mn, dev_mx = jnp.asarray(mnb), jnp.asarray(mxb)
        target = jnp.asarray(
            np.full(frames_per_batch, 0.5, np.float32) - maxq)
        res, _ = codec.encode_error_bounded_hostq(dev_u, dev_mn, dev_mx,
                                                  target, 1e-6)
        float(jnp.sum(res.base_bits_q))  # warm + sync
        dev_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res, _ = codec.encode_error_bounded_hostq(dev_u, dev_mn, dev_mx,
                                                      target, 1e-6)
            float(jnp.sum(res.base_bits_q))
            dev_best = min(dev_best, time.perf_counter() - t0)
        dev_pts_per_s = frames_per_batch * 721 * 1440 / dev_best

    maxerr = float(np.max(np.abs(rec - data)))
    assert maxerr <= 0.5, f"bound violated: {maxerr}"
    cr = data.nbytes / len(blob)
    value = data.size / total

    dev_note = (" [device unavailable: native-CPU-codec fallback]"
                if fallback_cpu else
                f"; device-only encode {dev_pts_per_s / 1e6:.1f}M pts/s")
    print(json.dumps({
        "metric": "compress+decompress grid-points/s @ max_error=0.5 (ERA5 "
                  f"721x1440, {n_frames} frames, CR={cr:.1f}x, "
                  f"maxerr={maxerr:.3f}, enc={enc_s:.2f}s, dec={dec_s:.2f}s"
                  f"{dev_note})",
        "value": round(value, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(value / BASELINE_GRID_POINTS_PER_S, 3),
        "device_encode_pts_per_s": round(dev_pts_per_s, 1),
        "wall_encode_s": round(enc_s, 3),
        "wall_decode_s": round(dec_s, 3),
        "cr": round(cr, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
