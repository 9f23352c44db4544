"""Pure-CPU encoder: compress frames with no JAX involvement.

Forward twin of :mod:`ebcc_tpu.runtime.cpu_decoder`, backed by
``native/ebcc_cpu_encoder.cc``.  This is what the write side of the HDF5
filter plugins runs (the reference's C encoder role,
/root/reference/src/h5z_j2k.c:124-136); it is exposed here so plain-CPU
writers (data pipelines, test harnesses) can produce containers without a
device.

The CPU encoder replicates the device pipeline's arithmetic exactly
(XLA-style FMA fusion and reciprocal strength reduction in the lifting
kernels): on identical input and config it emits **byte-identical**
containers to :func:`ebcc_tpu.api.compress` running on the CPU backend —
enforced by tests/test_cpu_encoder.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..codec import container
from ..codec.config import (EBCCConfig, ResidualMode, base_error_quantile,
                            pure_fallback_disabled)
from . import native as _native


def _fn(lib):
    fn = lib.ebcc_cpu_encode_frame
    fn.restype = ctypes.c_int64
    return fn


def compress(data, config: EBCCConfig | None = None, *, error_bound=None,
             qbase: float | None = None, _validated: bool = False) -> bytes:
    """Compress ``data`` ([..., H, W] float32) into a container blob on the
    CPU.  Mirrors :func:`ebcc_tpu.api.compress` (same modes, same blob
    format, byte-identical output).  ``_validated``: the caller already
    ran the shape/finiteness checks (api.compress's auto-routing) — skip
    the second full-array scan."""
    lib = _native._load()
    if lib is None:
        raise RuntimeError("native runtime unavailable (make -C native)")
    config = config or EBCCConfig()
    data = np.asarray(data, np.float32)
    if not _validated:
        if data.ndim < 2:
            raise ValueError("data must be at least 2-D")
        if min(data.shape[-2], data.shape[-1]) < 4:
            raise ValueError("frames must be at least 4x4")
    h, w = data.shape[-2], data.shape[-1]
    frames = np.ascontiguousarray(data.reshape(-1, h, w))
    if not _validated and not np.isfinite(frames).all():
        raise ValueError("NaN or Inf in data (j2k_codec.h:451-458)")
    mode = config.mode
    if qbase is None:
        qbase = base_error_quantile()
    error = float(config.error)
    residual_cr = float(config.residual_cr)
    targets = None
    if mode == ResidualMode.POINTWISE_MAX_ERROR:
        if error_bound is None:
            raise ValueError("POINTWISE_MAX_ERROR requires error_bound")
        eb = np.asarray(error_bound, np.float32).reshape(frames.shape)
        # per-point target with the drift-absorbing safety margin — the
        # SAME function api.compress uses, so containers stay
        # byte-identical across backends (j2k_codec.h:842-845 semantics)
        from ..api import pointwise_targets
        targets = np.ascontiguousarray(pointwise_targets(
            frames, eb, config.pointwise_max_error_ratio), np.float32)

    enc = _fn(lib)
    cap = 8 * h * w + 65536
    disable_pure = 1 if pure_fallback_disabled() else 0
    blobs: list = [None] * frames.shape[0]

    def run(i):
        out = np.zeros(cap, np.uint8)
        t = (targets[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
             if targets is not None else None)
        sz = enc(
            frames[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t,
            ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(int(mode)),
            ctypes.c_float(error), ctypes.c_float(config.base_cr),
            ctypes.c_float(residual_cr), ctypes.c_float(qbase),
            ctypes.c_int(disable_pure),
            # 0 = masking off, 1 = greedy scan, 2 = union rule — must
            # track config.mask_search or backends emit different blobs
            ctypes.c_int(0 if not config.use_chunk_mask
                         else (2 if config.mask_search == "union" else 1)),
            ctypes.c_int(config.base_levels),
            ctypes.c_int(config.residual_levels),
            ctypes.c_int(config.nchunks), ctypes.c_int(config.base_nplanes),
            ctypes.c_int(config.residual_nplanes),
            ctypes.c_int(config.zstd_level),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(cap))
        if sz == -3:
            raise ValueError(
                "coefficient magnitudes exceed the configured bitplane "
                "budget; raise base_nplanes/residual_nplanes")
        if sz < 0:
            raise RuntimeError(f"cpu encode failed: {sz}")
        blobs[i] = out[:sz].tobytes()

    import os
    n = frames.shape[0]
    nthreads = min(n, os.cpu_count() or 1)
    if nthreads > 1:  # the ctypes calls release the GIL
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            list(ex.map(run, range(n)))
    else:
        for i in range(n):
            run(i)
    return container.pack_blob(blobs)
