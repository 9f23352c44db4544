"""Fused reconstruction-evaluation kernel (Pallas/Mosaic, TPU).

The error-bounded truncation searches are built from one repeated unit —
"reconstruct the coefficients at a truncation/mask candidate, inverse
transform, compare against the reference field, reduce to (max excess,
violation count)" (codec/pipeline.py::_stats_at and _search_mask.stats_of,
the TPU re-design of the reference's re-encode probes, j2k_codec.h:562-695).
Under XLA that unit costs ~9 full-frame HBM round trips per evaluation
(compose, per-level lifting passes, tail+reduce) and the round-5 on-chip
profile attributes ~70% of device encode time to it (BENCHMARKS.md
roofline).  This kernel runs the WHOLE unit per frame inside VMEM: the only
HBM traffic is reading the integer coefficients and the reference field(s)
once each, plus two output scalars.

Exactness contract: every arithmetic step replicates the jnp path's
formula and evaluation order.  Residual differences are COMPILER
artifacts common to all backends (XLA contracts multiply-adds into FMAs
depending on fusion context, moving the lifting chain by ~1 ulp; the
jitted pipeline already differs from eager execution the same way), so
the enforced contract is: identical feasibility DECISIONS and
byte-identical containers with the kernel on/off —
tests/test_pallas_eval.py (interpret mode) plus the on-chip A/B
(scripts/pallas_eval_ab.py).  Lowering notes: stride-2 even/odd access is
expressed as the trivial (n/2, 2, w) reshape (direct strided slicing does
not lower, scripts/pallas_idwt_probe.py), and row lifting runs as a
transpose sandwich around the sublane (axis-0) lifting — in-VMEM
transposes lower cleanly and cost well under the HBM passes they replace.

Four static variants: kind ("base" | "resid" reconstruction tail) x mode
("trunc" prefix candidates | "masked" chunk-mask candidates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwt import ALPHA, BETA, DELTA, GAMMA, XI

U16_MAX = 65535.0
RESID_SCALE = 255.0
_NEG_INF = float("-inf")


def supported(hp: int, wp: int, levels: int) -> bool:
    """Geometry the kernel handles: every level's sub-shape even and >= 4
    in both dims (the lifting's requirement, matching ops/dwt.py)."""
    for i in range(levels):
        hh, ww = hp >> i, wp >> i
        if hh % 2 or ww % 2 or hh < 4 or ww < 4:
            return False
    return True


def _subband_peaks(levels: int) -> tuple:
    """Per-subband weight constants, replicating weights.weight_array's
    numpy post-processing exactly (clip + min-normalise in float32)."""
    from . import weights

    peaks = np.asarray(weights.synthesis_peaks(levels), np.float32)
    peaks = np.clip(peaks, 1.0 / 8, 8.0)
    peaks = peaks / peaks.min()
    return tuple(float(v) for v in peaks)


def _lift_cols(x):
    """Inverse CDF 9/7 lifting along axis 0 — the formulas (and therefore
    the f32 rounding) of dwt.idwt1d_v, with the even/odd interleave
    expressed as a Mosaic-friendly trivial reshape."""
    n2 = x.shape[0] // 2
    s = x[:n2, :] / XI
    d = x[n2:, :] * XI

    def prev(v):
        return jnp.concatenate([v[1:2, :], v[:-1, :]], axis=0)

    def nxt_r(v):
        return jnp.concatenate([v[1:, :], v[-2:-1, :]], axis=0)

    def nxt_e(v):
        return jnp.concatenate([v[1:, :], v[-1:, :]], axis=0)

    s = s - DELTA * (d + prev(d))
    d = d - GAMMA * (s + nxt_r(s))
    even = s - BETA * (d + prev(d))
    odd = d - ALPHA * (even + nxt_e(even))
    out = jnp.concatenate([even[:, None, :], odd[:, None, :]], axis=1)
    return out.reshape(2 * n2, x.shape[1])


def _idwt2d_value(x):
    """One 2-D synthesis level on a VMEM value: columns then rows
    (rows via transpose sandwich; bit-identical to dwt.idwt2d)."""
    x = _lift_cols(x)
    return _lift_cols(x.T).T


def _msb_value(mag):
    """floor(log2(mag)) + 1 semantics of bitplane._msb (exact replica)."""
    res = jnp.full(mag.shape, -1, jnp.int32)
    v = mag
    for shift in (16, 8, 4, 2, 1):
        hit = v >= (1 << shift)
        res = jnp.where(hit, res + shift, res)
        v = jnp.where(hit, v >> shift, v)
    return jnp.where(mag > 0, res + 1, -1)


def _plane_maps(hp, wp, levels, nchunks, peaks):
    """(wb, sid_chunk, valid-mask builders) from iota — no HBM tables."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    # subband map exactly as weights.subband_map (deeper levels overwrite)
    sid = jnp.zeros((hp, wp), jnp.int32)
    for i in range(levels):
        hh, ww = hp >> i, wp >> i
        in_h_top = rows < hh // 2
        in_h_bot = (rows >= hh // 2) & (rows < hh)
        in_w_left = cols < ww // 2
        in_w_right = (cols >= ww // 2) & (cols < ww)
        sid = jnp.where(in_h_top & in_w_right, 3 * i + 1, sid)
        sid = jnp.where(in_h_bot & in_w_left, 3 * i + 2, sid)
        sid = jnp.where(in_h_bot & in_w_right, 3 * i + 3, sid)
    wb = jnp.full((hp, wp), np.float32(peaks[0]), jnp.float32)
    for k in range(1, len(peaks)):
        wb = jnp.where(sid == k, np.float32(peaks[k]), wb)
    # stripe (chunk) id exactly as bitplane.stripe_id
    chunk = (rows * nchunks) // hp
    return rows, cols, wb, chunk


def _build_call(kind: str, mode: str, hp: int, wp: int, levels: int,
                nchunks: int, h: int, w: int, peaks: tuple,
                pointwise: bool, interpret: bool):
    """pallas_call for one (kind, mode, pointwise) variant; grid over
    frames.  ``pointwise``: the error target is a per-point field input
    (POINTWISE mode / DirectCompressor) instead of a per-frame scalar."""

    n_fields = (3 if kind == "resid" else 2) + (1 if pointwise else 0)

    def kernel(iparams_ref, fparams_ref, ci_ref, ref_ref, *rest):
        if kind == "resid":
            base_ref, *rest = rest
        if pointwise:
            tgt_ref, *rest = rest
        out_ref, work = rest

        rows, cols, wb, chunk = _plane_maps(hp, wp, levels, nchunks, peaks)

        fi = pl.program_id(0)  # scalar tables are unblocked (SMEM rule:
        b = iparams_ref[fi, 0]  # block dims must divide 8/128 or be full)
        ci = ci_ref[0]
        mag = jnp.abs(ci).astype(jnp.int32)
        neg = ci < 0

        if mode == "masked":
            dropmask = iparams_ref[fi, 3]
            dropped = (dropmask >> chunk) & 1
            d = b + dropped
            q = jnp.right_shift(mag, d)
            visible = q > 0
            q = q << d
            half = (jnp.exp2(d.astype(jnp.float32)) - 1.0) * 0.5
            rec = jnp.where(visible, q.astype(jnp.float32) + half, 0.0)
        else:
            js = iparams_ref[fi, 1]
            jr = iparams_ref[fi, 2]
            msb = _msb_value(mag)
            old = msb > b
            new = msb == b
            visible = old | (new & (chunk < js))
            beff = jnp.where(old & (chunk >= jr), b + 1, b)
            q = jnp.right_shift(mag, beff) << beff
            half = (jnp.exp2(beff.astype(jnp.float32)) - 1.0) * 0.5
            rec = jnp.where(visible, q.astype(jnp.float32) + half, 0.0)
        rec = jnp.where(neg, -rec, rec)

        work[:] = rec / wb
        for i in range(levels - 1, -1, -1):
            hh, ww = hp >> i, wp >> i
            work[:hh, :ww] = _idwt2d_value(work[:hh, :ww])

        dc = fparams_ref[fi, 0]
        tgt = tgt_ref[0] if pointwise else fparams_ref[fi, 3]
        y = work[:] + dc
        if kind == "base":
            mn, mx = fparams_ref[fi, 1], fparams_ref[fi, 2]
            y = jnp.minimum(jnp.maximum(y, 0.0), U16_MAX)
            out = y / U16_MAX * (mx - mn) + mn
        else:
            rmin, rmax = fparams_ref[fi, 1], fparams_ref[fi, 2]
            y = jnp.minimum(jnp.maximum(y, 0.0), RESID_SCALE)
            out = base_ref[0] + (y / RESID_SCALE * (rmax - rmin) + rmin)
        err = jnp.abs(ref_ref[0] - out) - tgt
        valid = (rows < h) & (cols < w)
        out_ref[fi, 0] = jnp.max(jnp.where(valid, err, _NEG_INF))
        out_ref[fi, 1] = jnp.sum(
            jnp.where(valid & (err > 0), 1.0, 0.0).astype(jnp.float32))

    field = pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [field] * n_fields

    def call(batch):
        # the default 16 MB scoped-vmem limit only covers one double-
        # buffered full-frame input; the working set here is 2 x
        # n_fields x 4.5 MB input blocks + the 4.5 MB scratch + ~12 MB of
        # lifting-chain temporaries (measured from the compiler's OOM
        # report).  v5e has 128 MB physical VMEM; grant generous headroom.
        vmem_bytes = 96 * 1024 * 1024
        return pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((batch, 2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_bytes),
            interpret=interpret,
        )

    return call


@functools.lru_cache(maxsize=None)
def _cached_call(kind, mode, hp, wp, levels, nchunks, h, w, pointwise,
                 interpret):
    peaks = _subband_peaks(levels)
    return _build_call(kind, mode, hp, wp, levels, nchunks, h, w, peaks,
                       pointwise, interpret)


def eval_stats(ci, ref, b, *, kind: str, mode: str, levels: int,
               nchunks: int, h: int, w: int,
               js=None, jr=None, dropmask=None,
               dc=None, lo=None, hi=None, tgt=None, base_rec=None,
               tgt_field=None, interpret: bool = False):
    """Fused (max excess, violation count) of one candidate per frame.

    ``ci``: int32 [B, hp, wp] integer coefficients; ``ref``: f32
    [B, hp, wp] comparison field, zero-padded past (h, w) (masked out);
    ``b``/``js``/``jr``/``dropmask``: per-frame i32 candidates; ``dc``:
    per-frame DC; ``lo``/``hi``: (mn, mx) for kind="base", (rmin, rmax)
    for kind="resid"; ``tgt``: per-frame scalar error target — or pass
    ``tgt_field`` (f32 [B, hp, wp], padding masked out) for POINTWISE
    per-point targets; ``base_rec``: f32 [B, hp, wp] fixed base
    reconstruction (kind="resid" only).  Returns (maxd [B], count [B]).
    """
    batch, hp, wp = ci.shape
    zi = jnp.zeros((), jnp.int32)
    pointwise = tgt_field is not None

    def col(v):
        v = jnp.asarray(v)
        return jnp.broadcast_to(v.astype(jnp.int32), (batch,))[:, None]

    iparams = jnp.concatenate([
        col(b),
        col(js if js is not None else zi),
        col(jr if jr is not None else zi),
        col(dropmask if dropmask is not None else zi)], axis=1)

    def fcol(v):
        v = jnp.asarray(v, jnp.float32)
        return jnp.broadcast_to(v, (batch,))[:, None]

    fparams = jnp.concatenate(
        [fcol(dc), fcol(lo), fcol(hi),
         fcol(tgt if tgt is not None else 0.0)], axis=1)

    call = _cached_call(kind, mode, hp, wp, levels, nchunks, h, w,
                        pointwise, interpret)
    args = (iparams, fparams, ci, ref)
    if kind == "resid":
        args = args + (base_rec,)
    if pointwise:
        args = args + (tgt_field,)
    out = call(batch)(*args)
    return out[:, 0], out[:, 1]
