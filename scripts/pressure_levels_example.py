"""Per-pressure-level compression example.

Equivalent of /root/reference/scripts/pressure_levels_ebcc_example.py:45-135:
compress a [L, H, W] stack of pressure levels with the direct pointwise
compressor, report per-level CR and verify the bound per level.
"""

import argparse

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("--ratio", type=float, default=1.0)
    p.add_argument("--rel-bound", type=float, default=0.01,
                   help="per-level bound = rel * (max - min)")
    args = p.parse_args()

    if args.input:
        stack = np.load(args.input).astype(np.float32)
    else:
        rng = np.random.default_rng(1)
        y, x = np.mgrid[0:240, 0:480]
        stack = np.stack([
            (250 + 10 * lvl + 20 * np.sin(y / 240 * np.pi + lvl) *
             np.cos(x / 480 * np.pi)).astype(np.float32) +
            rng.normal(0, 0.2, (240, 480)).astype(np.float32)
            for lvl in range(8)])

    from ebcc_tpu import DirectCompressor
    comp = DirectCompressor(base_cr=100, ratio=args.ratio)
    total_in = total_out = 0
    for lvl in range(stack.shape[0]):
        data = stack[lvl]
        eb = np.full_like(data, args.rel_bound * (data.max() - data.min()))
        blob = comp.compress(data, eb)
        rec = comp.decompress(blob)
        viol = int(np.sum(np.abs(rec - data) > eb))
        total_in += data.nbytes
        total_out += len(blob)
        print(f"level {lvl:2d}: CR={data.nbytes / len(blob):7.1f}x  "
              f"violations={viol}")
        assert viol == 0
    print(f"total: CR={total_in / total_out:.1f}x")


if __name__ == "__main__":
    main()
