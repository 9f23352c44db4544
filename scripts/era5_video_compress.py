"""Video-codec baseline on ERA5 frames — the comparison row the reference
produces with /root/reference/scripts/era5_video_compress.py:34-83.

Normalises an [N, H, W] stack to [0, 1] with the global min/max, pipes it
through ffmpeg (x264 by default) via ``models/video.py``, maps back, and
reports size / CR / max-abs-error / MSE / throughput.  For the comparative
row it also runs the EBCC codec on the same frames at a max-error bound
equal to the video codec's *achieved* max error, so the table answers the
question the baseline exists for: what does EBCC give at the error level
the video codec happens to land on?

Input: ``--input path.npy|.h5|.nc`` (first 2-D+ float dataset), else the
reference fixture frame replicated with small perturbations, else a
synthetic field — same fallback chain as the other drivers.  Requires an
``ffmpeg`` binary for the video row (exits with a clear message otherwise).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_frames(path: str | None, steps: int) -> np.ndarray:
    if path:
        from ebcc_tpu.cli import _load
        data = _load(path)
        data = data.reshape(-1, *data.shape[-2:])[:steps]
        return np.ascontiguousarray(data, np.float32)
    ref = "/root/reference/data/test_data.npy"
    if os.path.exists(ref):
        base = np.load(ref).astype(np.float32)
    else:
        y, x = np.mgrid[0:721, 0:1440]
        base = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)
    rng = np.random.default_rng(0)
    return np.stack([base + rng.normal(0, 0.05, base.shape).astype(np.float32)
                     for _ in range(steps)])


def video_row(data: np.ndarray, codec: str, crf: int) -> dict:
    """Reference flow: global min-max normalise -> ffmpeg -> un-normalise
    (era5_video_compress.py:39-66)."""
    from ebcc_tpu.models.video import VideoArrayCompressor

    mn, mx = float(data.min()), float(data.max())
    norm = (np.zeros_like(data) if mx == mn
            else np.clip((data - mn) / (mx - mn), 0.0, 1.0))
    comp = VideoArrayCompressor(codec=codec, crf=crf)
    t0 = time.time()
    blob = comp.compress(norm)
    rec_norm = comp.decompress(blob)
    elapsed = time.time() - t0
    rec = (np.full_like(data, mn) if mx == mn
           else rec_norm * (mx - mn) + mn)
    diff = (rec - data).astype(np.float64)
    return {
        "method": f"video-{codec}-crf{crf}",
        "compressed_bytes": len(blob),
        "cr": data.nbytes / len(blob),
        "max_abs_error": float(np.abs(diff).max()),
        "mse": float(np.mean(diff ** 2)),
        "throughput_mb_s": data.nbytes / elapsed / 2**20,
    }


def ebcc_row(data: np.ndarray, bound: float) -> dict:
    """EBCC at a max-error bound equal to the video codec's achieved error."""
    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode

    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=bound, base_cr=100,
                     max_batch=data.shape[0])
    t0 = time.time()
    blob = ebcc_tpu.compress(data, cfg)
    rec = ebcc_tpu.decompress(blob, cfg).reshape(data.shape)
    elapsed = time.time() - t0
    diff = (rec - data).astype(np.float64)
    maxerr = float(np.abs(diff).max())
    assert maxerr <= bound, f"bound violated: {maxerr} > {bound}"
    return {
        "method": f"ebcc max_error={bound:.6g}",
        "compressed_bytes": len(blob),
        "cr": data.nbytes / len(blob),
        "max_abs_error": maxerr,
        "mse": float(np.mean(diff ** 2)),
        "throughput_mb_s": data.nbytes / elapsed / 2**20,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="npy/h5/nc frame stack (synthetic "
                   "fallback when omitted)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--codec", default="x264",
                   choices=["x264", "x265", "vp9"])
    p.add_argument("--crf", type=int, default=23)
    p.add_argument("--no-ebcc", action="store_true",
                   help="video row only (the reference's exact scope)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from ebcc_tpu.models.video import available
    if not available():
        print("ffmpeg not found on PATH — the video baseline needs it "
              "(models/video.py is gated on the binary).", file=sys.stderr)
        return 2

    data = _load_frames(args.input, args.steps)
    print(f"frames: {data.shape[0]}, size {data.shape[1]}x{data.shape[2]}, "
          f"original {data.nbytes} B")
    rows = [video_row(data, args.codec, args.crf)]
    if not args.no_ebcc:
        rows.append(ebcc_row(data, rows[0]["max_abs_error"]))

    if args.json:
        print(json.dumps(rows, indent=2))
    else:
        hdr = f"{'method':28} {'bytes':>10} {'CR':>8} {'max err':>10} " \
              f"{'MSE':>12} {'MB/s':>8}"
        print(hdr)
        print("-" * len(hdr))
        for r in rows:
            print(f"{r['method']:28} {r['compressed_bytes']:>10} "
                  f"{r['cr']:>8.2f} {r['max_abs_error']:>10.4g} "
                  f"{r['mse']:>12.5g} {r['throughput_mb_s']:>8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
