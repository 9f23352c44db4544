"""Per-subband coefficient weighting for L-infinity rate control.

The reference codes DWT coefficients unweighted (SPIHT over raw lifting
output, spiht_re.c:431-474), so a bitplane truncated at 2^b produces
different data-domain errors per subband (each subband's synthesis basis has
a different peak amplitude).  Here every subband is scaled by the *peak
amplitude of its synthesis basis* before bitplane coding, so one coded
bitplane corresponds to one uniform data-domain error level — strictly better
rate at equal max-error bound.  Weights are deterministic functions of the
transform size, recomputed at decode; nothing is stored.
"""

from __future__ import annotations

import functools

import numpy as np

from . import dwt


def subband_map(h: int, w: int, levels: int) -> np.ndarray:
    """Integer subband id per coefficient of an [h, w] Mallat layout.

    id 0 = LL at the deepest level; then per level l (deepest first)
    HL = 3l+1, LH = 3l+2, HH = 3l+3 ... level index 0 is the deepest.
    """
    m = np.zeros((h, w), np.int32)
    for i in range(levels):  # i = 0 is the first (shallowest) decomposition
        hh, ww = h >> i, w >> i
        m[: hh // 2, ww // 2: ww] = 3 * i + 1   # HL
        m[hh // 2: hh, : ww // 2] = 3 * i + 2   # LH
        m[hh // 2: hh, ww // 2: ww] = 3 * i + 3  # HH
    return m


@functools.lru_cache(maxsize=None)
def synthesis_peaks(levels: int) -> tuple:
    """Peak |amplitude| of the synthesis basis per subband id (numeric).

    Computed by placing a unit impulse in the middle of each subband of a
    small canonical grid and running the inverse transform.
    """
    n = 1 << (levels + 3)
    peaks = [0.0] * (3 * levels + 1)
    smap = subband_map(n, n, levels)
    for sid in range(3 * levels + 1):
        ys, xs = np.nonzero(smap == sid)
        # central coefficient of the subband, away from boundaries
        cy, cx = ys[len(ys) // 2], xs[len(xs) // 2]
        imp = np.zeros((1, n, n), np.float32)
        imp[0, cy, cx] = 1.0
        rec = np.asarray(dwt.idwt2d_multi(imp, levels))
        # quantise to a 1/1024 grid (exact in f32 for peaks < 8): the native
        # codec computes the same peaks with its own lifting arithmetic
        # (native/ebcc_cpu_decoder.cc synthesis_peaks) and the two must
        # produce IDENTICAL weight tables, not merely last-ulp-close ones —
        # weights scale coefficients ~1e5, so an ulp of weight difference
        # is ~1e-2 of reconstruction difference
        peaks[sid] = float(np.round(np.max(np.abs(rec)) * 1024.0) / 1024.0)
    return tuple(peaks)


@functools.lru_cache(maxsize=None)
def weight_array(h: int, w: int, levels: int) -> np.ndarray:
    """[h, w] float32 weight per coefficient: peak synthesis amplitude,
    clamped to [1/8, 8] and normalised so min weight == 1."""
    peaks = np.asarray(synthesis_peaks(levels), np.float32)
    peaks = np.clip(peaks, 1.0 / 8, 8.0)
    peaks = peaks / peaks.min()
    return peaks[subband_map(h, w, levels)].astype(np.float32)
