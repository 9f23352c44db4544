"""Pure-CPU decoder: decompress EBCC-TPU blobs with no JAX involvement.

The ecosystem role of the reference's C library (any plain-CPU reader —
an HDF5 filter plugin, a data pipeline worker — can decode): container
parsing here, everything numeric in native C++
(native/ebcc_cpu_decoder.cc: structural decode, subband weights, inverse
lifting, reconstruction).

Agreement with the JAX decoder is ~1e-3 in data units (float32 lifting
rounding differs in the last ulp); the error bound still holds with the
codec's search margins for practical bounds — see tests/test_cpu_decoder.py.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..codec import container
from . import native as _native


def _validate_header(hdr) -> None:
    """Bound untrusted header fields before they size native allocations,
    shifts, or reads (same limits as native/h5z_ebcc_tpu.cc)."""
    if (hdr.h == 0 or hdr.w == 0 or hdr.h > 65536 or hdr.w > 65536 or
            hdr.h * hdr.w > (1 << 28) or
            hdr.base_levels > 8 or hdr.resid_levels > 8 or
            not 1 <= hdr.nchunks <= 64 or
            not 1 <= hdr.base_nplanes <= 30 or hdr.resid_nplanes > 30 or
            hdr.max_step_b > 30 or hdr.max_step_r > 30 or
            hdr.base_nbits > 64 * hdr.h * hdr.w or
            hdr.resid_nbits > 64 * hdr.h * hdr.w or
            not (hdr.base_mask_plane == container.MASK_NONE or
                 hdr.base_mask_plane < hdr.base_nplanes) or
            not (hdr.resid_mask_plane == container.MASK_NONE or
                 hdr.resid_mask_plane < hdr.resid_nplanes)):
        raise ValueError("corrupt EBCC-TPU frame header")


def _decode_one(lib, hdr, base_stream: bytes, resid_stream: bytes,
                has_resid: bool) -> np.ndarray:
    frame = np.empty((hdr.h, hdr.w), np.float32)
    bmp = (-1 if hdr.base_mask_plane == container.MASK_NONE
           else hdr.base_mask_plane)
    rmp = (-1 if hdr.resid_mask_plane == container.MASK_NONE
           else hdr.resid_mask_plane)
    rc = lib.ebcc_cpu_decode_frame(
        ctypes.cast(ctypes.c_char_p(base_stream),
                    ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(hdr.base_nbits), ctypes.c_int(hdr.max_step_b),
        ctypes.c_float(hdr.mn), ctypes.c_float(hdr.mx),
        ctypes.c_float(hdr.dc_b),
        ctypes.c_int(hdr.h), ctypes.c_int(hdr.w),
        ctypes.c_int(hdr.base_levels), ctypes.c_int(hdr.base_nplanes),
        ctypes.c_int(hdr.nchunks),
        ctypes.c_int(bmp), ctypes.c_uint32(hdr.base_keep_mask),
        ctypes.c_int(1 if has_resid else 0),
        ctypes.cast(ctypes.c_char_p(resid_stream),
                    ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(hdr.resid_nbits), ctypes.c_int(hdr.max_step_r),
        ctypes.c_float(hdr.rmin), ctypes.c_float(hdr.rmax),
        ctypes.c_float(hdr.dc_r), ctypes.c_int(hdr.resid_levels),
        ctypes.c_int(hdr.resid_nplanes),
        ctypes.c_int(rmp), ctypes.c_uint32(hdr.resid_keep_mask),
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"cpu decode failed: {rc}")
    return frame


def decompress(blob: bytes) -> np.ndarray:
    """Decode a container blob to [N, H, W] float32 on the CPU.

    The zstd stage is batched through the threaded native runtime and the
    per-frame structural decodes run in a thread pool (the ctypes calls
    release the GIL) — one blob decodes with all host cores.
    """
    lib = _native._load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    frames = container.unpack_blob(blob)
    metas = [container.unpack_frame(fb) for fb in frames]
    out: list = [None] * len(frames)

    # batched zstd stage: every compressed stream in one native call
    zjobs, zmax, zdst = [], [], []  # (bytes), max sizes, (idx, which)
    for i, (hdr, zblob, base_stream, _) in enumerate(metas):
        if hdr.flags & container.FLAG_CONST:
            if hdr.h == 0 or hdr.w == 0 or hdr.h * hdr.w > (1 << 28):
                raise ValueError("corrupt EBCC-TPU frame header")
            out[i] = np.full((hdr.h, hdr.w), hdr.mn, np.float32)
            continue
        _validate_header(hdr)
        if hdr.flags & container.FLAG_BASE_Z:
            zjobs.append(base_stream)
            zmax.append((hdr.base_nbits + 7) // 8)
            zdst.append((i, "base"))
        if hdr.flags & container.FLAG_RESID:
            zjobs.append(zblob)
            zmax.append((hdr.resid_nbits + 7) // 8)
            zdst.append((i, "resid"))
    streams = {}
    if zjobs:
        for (i, which), raw in zip(zdst,
                                   _native.zstd_decompress_batch(zjobs,
                                                                 zmax)):
            streams[(i, which)] = raw

    def run(i):
        hdr, zblob, base_stream, _ = metas[i]
        base = streams.get((i, "base"), base_stream)
        has_resid = bool(hdr.flags & container.FLAG_RESID)
        resid = streams.get((i, "resid"), b"")
        # header-declared bit counts must be backed by actual bytes — the
        # C decoder trusts them (out-of-bounds read otherwise)
        if len(base) * 8 < hdr.base_nbits or \
                (has_resid and len(resid) * 8 < hdr.resid_nbits):
            raise ValueError("truncated EBCC-TPU frame stream")
        out[i] = _decode_one(lib, hdr, base, resid, has_resid)

    todo = [i for i in range(len(frames)) if out[i] is None]
    nthreads = min(len(todo), os.cpu_count() or 1)
    if nthreads > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            list(ex.map(run, todo))
    else:
        for i in todo:
            run(i)
    return np.stack(out)
