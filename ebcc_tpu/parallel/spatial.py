"""Spatially-sharded codec: the full encode pipeline on (data x space) meshes.

Round 1 built the halo-exchange DWT (ops/dwt_sharded.py) as a transform;
this module wires it into the CODEC: :class:`SpatialFrameCodec` runs the
whole error-bounded encode — transform, quadtree analysis, per-plane scan,
fine truncation scan, residual layer — on frames whose ROW axis is sharded
over a mesh axis, so a frame larger than one chip's memory (or a latency-
critical single frame) spreads over chips.  No reference counterpart: the
reference processes each frame whole on one core (SURVEY.md §2.4).

How it works:

* the forward/inverse DWT runs inside ``jax.shard_map`` with one boundary
  row exchanged per lifting step via ``ppermute`` (ops/dwt_sharded.py) —
  bit-identical to the single-device transform;
* the sharded transform leaves a per-shard Mallat layout; a static row
  permutation (``to_canonical`` semantics, computed per layer geometry at
  init) converts to/from the canonical layout ON DEVICE, so the quadtree
  analysis, bit counting and truncation search read exactly the arrays the
  single-device codec would — selections and streams are identical;
* everything else (pooling pyramid, per-plane error scans, reductions) is
  GSPMD-partitioned by XLA over the ``(data, space)`` sharding, with
  cross-shard collectives inserted automatically (psum-style reductions
  for the error statistics);
* the sparse transfer form is disabled (its full-frame sort does not
  partition usefully); hosts fall back to the dense u8/u16 forms.

Constraints: the padded row count of each layer must divide evenly into
``nshards * 2**levels`` rows per shard with at least 4 rows at the deepest
level — ``SpatialFrameCodec`` validates this at construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..codec.config import EBCCConfig
from ..codec.pipeline import FrameCodec, LayerGeom
from ..ops import dwt_sharded


@functools.lru_cache(maxsize=None)
def _canonical_maps(hp: int, wp: int, levels: int, nshards: int):
    """Static row-index maps between the per-shard Mallat layout and the
    canonical layout (ops/dwt_sharded.py to_canonical semantics).

    Returns (to_canon [hp, wp], from_canon [hp, wp]) int32 arrays:
    ``canonical[r, c] = gathered[to_canon[r, c], c]`` and inversely.
    """
    hs = hp // nshards

    def smap(lv):
        m = np.arange(hp >> lv)
        q = hs >> lv
        return (m // q) * hs + (m % q)

    def dmap(k):
        m = np.arange(hp >> k)
        q = hs >> k
        return (m // q) * hs + q + (m % q)

    def rowmap(lv):
        return np.concatenate([smap(lv)] +
                              [dmap(k) for k in range(lv, 0, -1)])

    to_c = np.empty((hp, wp), np.int32)
    from_c = np.empty((hp, wp), np.int32)
    groups = [(0, wp >> levels, levels)]
    for lv in range(levels, 0, -1):
        groups.append((wp >> lv, wp >> (lv - 1), lv))
    for lo, hi, lv in groups:
        rm = rowmap(lv)
        to_c[:, lo:hi] = rm[:, None].astype(np.int32)
        from_c[:, lo:hi] = np.argsort(rm)[:, None].astype(np.int32)
    return to_c, from_c


class SpatialFrameCodec(FrameCodec):
    """FrameCodec whose frames are row-sharded over a mesh ``space`` axis.

    Drop-in for :class:`FrameCodec`: same EncodeResult, same streams, same
    truncation decisions (the canonical-layout permutation makes every
    analysis input identical to the dense codec's).
    """

    def __init__(self, h: int, w: int, config: EBCCConfig, mesh,
                 data_axis: str = "data", space_axis: str = "space"):
        self.mesh = mesh
        self.data_axis = data_axis
        self.space_axis = space_axis
        self.nspace = mesh.shape[space_axis]
        super().__init__(h, w, config)
        for geom in (self.base, self.resid):
            hs = geom.hp // self.nspace
            if (geom.hp % self.nspace or hs % (1 << geom.levels) or
                    (hs >> geom.levels) < 4):
                raise ValueError(
                    f"padded rows {geom.hp} cannot shard over "
                    f"{self.nspace} devices with {geom.levels} DWT levels "
                    f"(need hp % n == 0, (hp/n) % 2**levels == 0, "
                    f"hp/n >> levels >= 4)")
        self._maps = {
            id(self.base): _canonical_maps(self.base.hp, self.base.wp,
                                           self.base.levels, self.nspace),
            id(self.resid): _canonical_maps(self.resid.hp, self.resid.wp,
                                            self.resid.levels, self.nspace),
        }

    # -- transform overrides: halo DWT + canonical permutation -----------

    def _spec3(self):
        return P(self.data_axis, self.space_axis, None)

    def _dwt(self, x, geom: LayerGeom):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, self._spec3()))
        sharded = jax.shard_map(
            lambda v: dwt_sharded.dwt2d_multi_sharded(
                v, geom.levels, self.space_axis),
            mesh=self.mesh, in_specs=self._spec3(),
            out_specs=self._spec3())(x)
        to_c, _ = self._maps[id(geom)]
        return jnp.take_along_axis(
            sharded, jnp.asarray(to_c)[None, :, :], axis=1)

    def _idwt(self, x, geom: LayerGeom):
        _, from_c = self._maps[id(geom)]
        gathered = jnp.take_along_axis(
            x, jnp.asarray(from_c)[None, :, :], axis=1)
        gathered = jax.lax.with_sharding_constraint(
            gathered, NamedSharding(self.mesh, self._spec3()))
        return jax.shard_map(
            lambda v: dwt_sharded.idwt2d_multi_sharded(
                v, geom.levels, self.space_axis),
            mesh=self.mesh, in_specs=self._spec3(),
            out_specs=self._spec3())(gathered)

    def _sparsify(self, p16, pack16_ok, k=None):
        # the sparse form's full-frame sort does not partition usefully;
        # disabled — the host coder uses the dense u8/u16 forms instead
        b = p16.shape[0]
        k = self.base_sparse_k if k is None else k
        z16 = jnp.zeros((b, k), jnp.uint16)
        return (z16, z16, jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), bool))


class SpatialShardedCodec:
    """Jitted entry points for :class:`SpatialFrameCodec` with the input
    stack sharded ``(data, space)`` — the spatial analogue of
    parallel.batch.ShardedCodec."""

    def __init__(self, h: int, w: int, config: EBCCConfig, mesh,
                 data_axis: str = "data", space_axis: str = "space"):
        self.mesh = mesh
        self.codec = SpatialFrameCodec(h, w, config, mesh,
                                       data_axis, space_axis)
        # raw frames enter sharded over the batch axis only (H is the
        # UNPADDED row count, generally not divisible by the space axis);
        # the pipeline reshards rows after the mirror pad (see
        # SpatialFrameCodec._dwt's sharding constraint)
        sh = NamedSharding(mesh, P(data_axis, None, None))
        rep = NamedSharding(mesh, P(data_axis))
        self._encode_eb = jax.jit(self.codec._encode_error_bounded,
                                  in_shardings=(sh, rep, None))
        self._encode_eb_pw = jax.jit(self.codec._encode_error_bounded,
                                     in_shardings=(sh, sh, None))

    def encode_error_bounded(self, data, target, qbase):
        target = jnp.asarray(target)
        fn = self._encode_eb_pw if target.ndim == 3 else self._encode_eb
        return fn(data, target, jnp.float32(qbase))

    @property
    def base(self):
        return self.codec.base

    @property
    def resid(self):
        return self.codec.resid
