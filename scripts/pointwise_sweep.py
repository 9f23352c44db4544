"""Pointwise-bound sweep over (base_cr x ratio) configurations.

Parity with /root/reference/scripts/run_pointwise.py and
hdf5_compression_pointwise_sweep.py: run the pointwise compressor over a
grid of base_cr and bound-scale values, verify the bound at every point
(check_error_pointwise, run_pointwise.py:157-183), and write a CSV.  Where
the reference fans out with multiprocessing.Pool over configs, the frames
here batch through the device codec per config.
"""

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", nargs="?", default=None,
                   help=".npy [*, H, W]; ERA5 fixture or synthetic if absent")
    p.add_argument("--base-crs", type=float, nargs="+", default=[50, 100])
    p.add_argument("--scales", type=float, nargs="+", default=[0.5, 1.0, 2.0],
                   help="bound = scale * 1%% of data range, per point")
    p.add_argument("--out", default="pointwise_sweep.csv")
    args = p.parse_args()

    if args.input:
        data = np.load(args.input).astype(np.float32)
    elif os.path.exists("/root/reference/data/test_data.npy"):
        data = np.load("/root/reference/data/test_data.npy").astype(
            np.float32)
    else:
        y, x = np.mgrid[0:721, 0:1440]
        data = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)
    data = data.reshape(-1, data.shape[-2], data.shape[-1])

    from ebcc_tpu import DirectCompressor
    rng = float(data.max() - data.min())
    rows = []
    for base_cr in args.base_crs:
        comp = DirectCompressor(base_cr=base_cr)
        for scale in args.scales:
            eb = np.full_like(data, scale * 0.01 * rng)
            t0 = time.perf_counter()
            blobs = [comp.compress(data[i], eb[i])
                     for i in range(len(data))]
            enc = time.perf_counter() - t0
            recs = np.stack([comp.decompress(b) for b in blobs])
            viol = int(np.sum(np.abs(recs - data) > eb))
            rows.append(dict(base_cr=base_cr, scale=scale,
                             bound=float(eb.flat[0]),
                             cr=data.nbytes / sum(map(len, blobs)),
                             violations=viol, encode_s=enc))
            print(json.dumps(rows[-1]))
            assert viol == 0, "pointwise bound violated"
    with open(args.out, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(rows[0]))
        wr.writeheader()
        wr.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
