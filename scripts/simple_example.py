"""Minimal direct-compressor example.

Parity with /root/reference/scripts/simple_ebcc_example.py:34-56: one
variable, pointwise bound, compress/decompress, report CR + bound check.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ebcc_tpu import DirectCompressor

    path = "/root/reference/data/test_data.npy"
    if os.path.exists(path):
        data = np.load(path).astype(np.float32)
    else:
        y, x = np.mgrid[0:721, 0:1440]
        data = (260 + 25 * np.sin(y / 721 * np.pi) *
                np.cos(x / 1440 * 2 * np.pi)).astype(np.float32)

    # bound: 1% of the data range, everywhere
    eb = np.full_like(data, 0.01 * (data.max() - data.min()))
    comp = DirectCompressor(base_cr=100)
    blob = comp.compress(data, eb)
    rec = comp.decompress(blob)

    viol = int(np.sum(np.abs(rec - data) > eb))
    print(f"original: {data.nbytes} B, compressed: {len(blob)} B, "
          f"CR = {data.nbytes / len(blob):.1f}x")
    print(f"max error: {np.abs(rec - data).max():.4f} "
          f"(bound {eb.flat[0]:.4f}), violations: {viol}")
    assert viol == 0


if __name__ == "__main__":
    main()
