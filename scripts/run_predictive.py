"""Forecast-predictive compression driver.

Parity with /root/reference/scripts/delta_compression/run_aurora.py: steps
0..warmup-1 compressed directly, later steps compress only the residual
against a forecast computed from previously *decompressed* states.  The
reference runs Microsoft Aurora on CUDA; here the model is pluggable
(--model persistence|linear, or point --model-module at a module exposing
``forecast(history) -> np.ndarray`` — e.g. a torch model wrapper).
"""

import argparse
import importlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def linear_forecast(history):
    if len(history) >= 2:
        return 2.0 * history[-1] - history[-2]
    return history[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", nargs="?", default=None,
                   help=".npy [T, H, W] time sequence; synthetic if absent")
    p.add_argument("--model", default="persistence",
                   choices=["persistence", "linear", "trained"],
                   help="'trained' trains the in-repo flax ConvForecaster "
                        "on the first half of the sequence "
                        "(ebcc_tpu.models.forecast, the Aurora-role model)")
    p.add_argument("--model-module", default=None,
                   help="python module with forecast(history)")
    p.add_argument("--train-steps", type=int, default=300)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--rel-bound", type=float, default=0.01)
    p.add_argument("--out", default=None,
                   help="per-step CSV (consumed by plot_predictive.py)")
    args = p.parse_args()

    if args.input:
        seq = np.load(args.input).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        y, x = np.mgrid[0:240, 0:480]
        frames = []
        phase = 0.0
        for t in range(8):
            phase += 0.15
            frames.append((260 + 25 * np.sin(y / 240 * np.pi + phase) *
                           np.cos(x / 480 * np.pi - phase) +
                           rng.normal(0, 0.2, (240, 480))).astype(np.float32))
        seq = np.stack(frames)

    from ebcc_tpu import DirectCompressor, PredictiveCompressor
    from ebcc_tpu.models.predictive import persistence_forecast

    if args.model_module:
        forecast = importlib.import_module(args.model_module).forecast
    elif args.model == "trained":
        from ebcc_tpu.models import forecast as fc
        half = max(args.warmup + 1, len(seq) // 2)
        params, meta = fc.train_forecaster(seq[:half], warmup=args.warmup,
                                           steps=args.train_steps)
        print(json.dumps({"trained": True, "frames": half,
                          "final_loss": meta["final_loss"]}))
        forecast = fc.make_forecast_fn(params, meta)
    else:
        forecast = {"persistence": persistence_forecast,
                    "linear": linear_forecast}[args.model]

    eb = np.full_like(seq, args.rel_bound * (seq.max() - seq.min()))
    direct = DirectCompressor(base_cr=100)

    t0 = time.perf_counter()
    pc = PredictiveCompressor(forecast_fn=forecast, warmup=args.warmup,
                              direct=direct)
    blob, step_info = pc.compress(seq, eb, return_info=True)
    enc = time.perf_counter() - t0
    rec = pc.decompress(blob)
    viol = int(np.sum(np.abs(rec - seq) > eb))

    # baseline: every step direct (one batched pipeline)
    base_blobs = [b for b, _ in direct.compress_batch(seq, eb)]
    if args.out:
        import csv
        with open(args.out, "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=["step", "predictive_bytes",
                                               "direct_bytes", "predictive"])
            wr.writeheader()
            for si, db in zip(step_info, base_blobs):
                wr.writerow(dict(step=si["step"],
                                 predictive_bytes=si["bytes"],
                                 direct_bytes=len(db),
                                 predictive=si["predictive"]))
        print(f"wrote {args.out}")
    print(json.dumps({
        "steps": len(seq), "model": args.model_module or args.model,
        "predictive_cr": seq.nbytes / len(blob),
        "direct_cr": seq.nbytes / sum(map(len, base_blobs)),
        "violations": viol, "encode_s": enc,
    }))
    assert viol == 0


if __name__ == "__main__":
    main()
