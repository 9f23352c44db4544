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
            hdr.resid_nbits > 64 * hdr.h * hdr.w):
        raise ValueError("corrupt EBCC-TPU frame header")


def decompress(blob: bytes) -> np.ndarray:
    """Decode a container blob to [N, H, W] float32 on the CPU."""
    lib = _native._load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    frames = container.unpack_blob(blob)
    out = []
    for fb in frames:
        hdr, zblob, base_stream, tot = container.unpack_frame(fb)
        if hdr.flags & container.FLAG_CONST:
            if hdr.h == 0 or hdr.w == 0 or hdr.h * hdr.w > (1 << 28):
                raise ValueError("corrupt EBCC-TPU frame header")
            out.append(np.full((hdr.h, hdr.w), hdr.mn, np.float32))
            continue
        _validate_header(hdr)
        if hdr.flags & container.FLAG_BASE_Z:
            base_stream = _native.zstd_decompress_batch(
                [base_stream], [(hdr.base_nbits + 7) // 8])[0]
        has_resid = bool(hdr.flags & container.FLAG_RESID)
        resid_stream = b""
        if has_resid:
            resid_stream = _native.zstd_decompress_batch(
                [zblob], [(hdr.resid_nbits + 7) // 8])[0]
        # header-declared bit counts must be backed by actual bytes — the C
        # decoder trusts them (out-of-bounds read otherwise)
        if len(base_stream) * 8 < hdr.base_nbits or \
                (has_resid and len(resid_stream) * 8 < hdr.resid_nbits):
            raise ValueError("truncated EBCC-TPU frame stream")
        frame = np.empty((hdr.h, hdr.w), np.float32)
        rc = lib.ebcc_cpu_decode_frame(
            ctypes.cast(ctypes.c_char_p(base_stream),
                        ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(hdr.base_nbits), ctypes.c_int(hdr.max_step_b),
            ctypes.c_float(hdr.mn), ctypes.c_float(hdr.mx),
            ctypes.c_float(hdr.dc_b),
            ctypes.c_int(hdr.h), ctypes.c_int(hdr.w),
            ctypes.c_int(hdr.base_levels), ctypes.c_int(hdr.base_nplanes),
            ctypes.c_int(hdr.nchunks),
            ctypes.c_int(1 if has_resid else 0),
            ctypes.cast(ctypes.c_char_p(resid_stream),
                        ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(hdr.resid_nbits), ctypes.c_int(hdr.max_step_r),
            ctypes.c_float(hdr.rmin), ctypes.c_float(hdr.rmax),
            ctypes.c_float(hdr.dc_r), ctypes.c_int(hdr.resid_levels),
            ctypes.c_int(hdr.resid_nplanes),
            frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError(f"cpu decode failed: {rc}")
        out.append(frame)
    return np.stack(out)
