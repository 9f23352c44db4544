"""Pallas TPU kernels for the bitplane-coder hot ops.

Round-2 background: a fused in-VMEM Pallas IDWT was Mosaic-infeasible in
this toolchain (the lane-axis interleave needs a sub-region transpose that
Mosaic rejects on non-128-multiple lane widths — ROUND2.md).  This module
targets the OTHER hot analysis op, which is Mosaic-friendly by
construction: the level-0 segment counts of ``ops.bitplane.segment_counts``
are pure elementwise comparisons + full reductions over a row-stripe tile —
no interleave, no transpose, no lane shuffles.

Why it is worth a kernel: the jnp formulation reduces ``3 * nchunks``
masked [B, nplanes, H, W] arrays, so XLA re-reads the msb/parent planes
from HBM once per (plane, segment) combination it fails to fuse.  The
kernel reads each row stripe into VMEM ONCE and takes all ``3 * nplanes``
scalar counts from registers, writing 3·P·J int32s per frame.

The kernel is wired behind ``EBCCConfig.use_pallas_counts`` /
``EBCC_PALLAS=1`` (default off until the on-chip A/B in BENCHMARKS.md) and
is bit-exact with the jnp path (tests/test_pallas.py runs it in interpret
mode on CPU; the flag changes scheduling only, never stream bytes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level0_kernel(msb_ref, par_ref, out_ref, *, nplanes: int):
    """Counts for ONE (frame, stripe) tile.

    msb_ref/par_ref: [1, 1, th, wp] int32 (msb of each coefficient; msb of
    its level-1 quadtree parent, pre-upsampled).  out_ref: [1, 1, P, 3]
    int32 in SMEM — per plane p (ascending): [significance bits, sign bits,
    refinement bits], matching bitplane.segment_counts's level-0 masks
    (emit0 / new / old) for this stripe.
    """
    msb = msb_ref[0, 0]
    par = par_ref[0, 0]
    for p in range(nplanes):
        # emit0: parent significant at p, self not yet (msb <= p)
        out_ref[0, 0, p, 0] = jnp.sum(((par >= p) & (msb <= p))
                                      .astype(jnp.int32))
        out_ref[0, 0, p, 1] = jnp.sum((msb == p).astype(jnp.int32))
        out_ref[0, 0, p, 2] = jnp.sum((msb > p).astype(jnp.int32))


def level0_supported(height: int, width: int, group_levels: int,
                     nchunks: int) -> bool:
    """The kernel covers uniform row stripes (hp % J == 0, guaranteed for
    levels >= 2 since hp divides 2**(levels+1)) and needs a real quadtree
    (G >= 1) so the level-1 parent plane exists."""
    del width
    return group_levels >= 1 and height % nchunks == 0


@functools.partial(jax.jit,
                   static_argnames=("nplanes", "nchunks", "interpret"))
def level0_counts(msb, par_msb, nplanes: int, nchunks: int,
                  interpret: bool = False):
    """Per-stripe level-0 counts: [B, J, P, 3] int32, planes ASCENDING.

    ``msb``: [B, hp, wp] int32; ``par_msb``: [B, hp, wp] int32 (the level-1
    subtree max msb, nearest-neighbour upsampled to full resolution).
    """
    b, hp, wp = msb.shape
    th = hp // nchunks
    # Tiles are addressed as [B, J, th, wp] so each block covers the FULL
    # trailing two dims — Mosaic requires the last two block dims to be
    # (8, 128)-divisible OR equal to the array dims, and a row stripe of a
    # 721x1440-class frame (th = 92) is not 8-divisible.
    msb4 = msb.reshape(b, nchunks, th, wp)
    par4 = par_msb.reshape(b, nchunks, th, wp)
    return pl.pallas_call(
        functools.partial(_level0_kernel, nplanes=nplanes),
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, 1, th, wp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, th, wp), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, nplanes, 3), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, nchunks, nplanes, 3), jnp.int32),
        interpret=interpret,
    )(msb4, par4)
