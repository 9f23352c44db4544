"""Standard-vs-delta comparison with hard bound verification.

Equivalent of /root/reference/scripts/delta_compression_test.py:25-199: runs
the direct pointwise compressor and the pressure-level delta chain over a
multi-level stack, verifies |x - x_hat| <= eb at every point, prints a
PASS/FAIL summary and exits non-zero on violation.
"""

import argparse
import sys
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", nargs="?", default=None,
                   help=".npy stack [L, H, W]; synthetic if omitted")
    p.add_argument("--error", type=float, default=0.5)
    p.add_argument("--levels", type=int, default=6)
    args = p.parse_args()

    if args.input:
        stack = np.load(args.input).astype(np.float32)
        stack = stack.reshape(-1, stack.shape[-2], stack.shape[-1])
    else:
        rng = np.random.default_rng(0)
        y, x = np.mgrid[0:240, 0:480]
        base = 260 + 25 * np.sin(y / 240 * np.pi) * np.cos(x / 480 * np.pi)
        levels = [base.astype(np.float32)]
        for _ in range(args.levels - 1):
            levels.append(levels[-1] * 0.97 +
                          rng.normal(0, 0.3, base.shape).astype(np.float32))
        stack = np.stack(levels)

    from ebcc_tpu import DeltaCompressor, DirectCompressor
    eb = np.full_like(stack, args.error)

    ok = True
    for name, comp in [
        ("standard", None),
        ("delta", DeltaCompressor(base_cr=100)),
    ]:
        t0 = time.perf_counter()
        if comp is None:
            direct = DirectCompressor(base_cr=100)
            blobs = [direct.compress(stack[i], eb[i])
                     for i in range(len(stack))]
            size = sum(map(len, blobs))
            rec = np.stack([direct.decompress(b) for b in blobs])
        else:
            blob = comp.compress(stack, eb)
            size = len(blob)
            rec = comp.decompress(blob)
        dt = time.perf_counter() - t0
        viol = int(np.sum(np.abs(rec - stack) > eb))
        cr = stack.nbytes / size
        status = "PASS" if viol == 0 else "FAIL"
        ok &= viol == 0
        print(f"{name:10s} CR={cr:7.1f}x  max_err="
              f"{float(np.abs(rec - stack).max()):.4g}  violations={viol}  "
              f"({dt:.1f}s)  {status}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
