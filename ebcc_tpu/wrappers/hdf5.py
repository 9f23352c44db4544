"""HDF5 integration: store EBCC-TPU containers inside HDF5 files.

The reference integrates as an HDF5 *filter plugin* (filters 308/310,
/root/reference/src/h5z_j2k.c:26-40) configured through ``EBCC_Filter``
(/root/reference/ebcc_wrapper/filter_wrapper.py:19-82), so any HDF5 reader
with the plugin on ``HDF5_PLUGIN_PATH`` sees a normal float dataset.

A C filter plugin cannot host the TPU compute path, so the TPU framework
integrates one level up, at the h5py API: :func:`write_dataset` compresses
with the batched device codec and stores the container as an opaque uint8
dataset carrying self-describing attrs; :func:`read_dataset` reverses it.
:class:`EBCCFilterParams` keeps the ``EBCC_Filter`` construction surface
(dataset name, shape, bound mode/value, base_cr) so reference call sites
translate one-for-one.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from .. import api
from ..codec.config import MODE_NAMES as _MODE_NAMES
from ..codec.config import EBCCConfig, ResidualMode

_ATTR = "ebcc_tpu"


@dataclasses.dataclass
class EBCCFilterParams:
    """Construction-parity equivalent of ``EBCC_Filter``
    (filter_wrapper.py:19-82).

    ``residual_opt`` is a ``(mode_name, value)`` pair, e.g.
    ``("relative_error", 0.009)`` — the same surface as the reference's
    ``residual_opt`` tuples.
    """

    base_cr: float = 100.0
    height: int = 721
    width: int = 1440
    residual_opt: tuple = ("max_error_target", 1e-2)

    def to_config(self) -> EBCCConfig:
        name, value = self.residual_opt
        name = {"max_error_target": "max_error",
                "relative_error_target": "relative_error",
                "quantile_target": "sparsification_factor",
                "fixed_sparsification": "sparsification_factor",
                }.get(name, name)
        mode = _MODE_NAMES[name]
        kw = dict(mode=mode, base_cr=float(self.base_cr))
        if mode in (ResidualMode.MAX_ERROR, ResidualMode.RELATIVE_ERROR):
            kw["error"] = float(value)
        elif mode == ResidualMode.SPARSIFICATION_FACTOR:
            kw["residual_cr"] = float(value)
        elif mode == ResidualMode.POINTWISE_MAX_ERROR:
            kw["pointwise_max_error_ratio"] = float(value)
        return EBCCConfig(**kw)


def write_dataset(group, name: str, data, config: EBCCConfig | None = None,
                  error_bound=None, params: EBCCFilterParams | None = None):
    """Compress ``data`` and store it as ``group[name]`` (opaque bytes)."""
    if config is None:
        config = (params or EBCCFilterParams(
            height=data.shape[-2], width=data.shape[-1])).to_config()
    data = np.asarray(data, np.float32)
    blob = api.compress(data, config, error_bound=error_bound)
    dset = group.create_dataset(
        name, data=np.frombuffer(blob, np.uint8), dtype=np.uint8)
    dset.attrs[_ATTR] = json.dumps({
        "version": 1,
        "shape": list(data.shape),
        "mode": int(config.mode),
        "config": {k: (v if not isinstance(v, ResidualMode) else int(v))
                   for k, v in dataclasses.asdict(config).items()},
    })
    return dset


def read_dataset(dset) -> np.ndarray:
    """Decompress a dataset written by :func:`write_dataset`."""
    meta = json.loads(dset.attrs[_ATTR])
    cfg = meta["config"]
    cfg["mode"] = ResidualMode(cfg["mode"])
    config = EBCCConfig(**cfg)
    blob = bytes(np.asarray(dset[:], np.uint8))
    out = api.decompress(blob, config)
    return out.reshape(meta["shape"])


def is_ebcc_dataset(dset) -> bool:
    return _ATTR in getattr(dset, "attrs", {})


# ---------------------------------------------------------------------------
# True HDF5-filter integration (reference parity: filters 308/310)
# ---------------------------------------------------------------------------

FILTER_ID = 33076  # EBCC-TPU (user-range filter id)

def _plugin_dir() -> str:
    from ..runtime.native import _NATIVE_DIR
    return _NATIVE_DIR


def register_plugin_path(path: str | None = None):
    """Make libh5z_ebcc_tpu.so discoverable by libhdf5 (reader side).

    The reference sets HDF5_PLUGIN_PATH (filter_wrapper.py:3); h5py also
    accepts runtime registration via h5py.h5pl.
    """
    import h5py
    p = (path or _plugin_dir()).encode()
    try:
        existing = [h5py.h5pl.get(i) for i in range(h5py.h5pl.size())]
    except Exception:
        existing = []
    if p not in existing:
        h5py.h5pl.prepend(p)


def write_filtered_dataset(group, name: str, data,
                           config: EBCCConfig | None = None,
                           error_bound=None):
    """Create a REAL filtered float dataset (one frame per chunk).

    Readers that load the plugin (``register_plugin_path()`` or
    HDF5_PLUGIN_PATH) see a plain float32 dataset — the reference's
    integration model (h5z_j2k.c).  Compression runs through the normal
    TPU path here; the pre-compressed frame containers are stored with
    H5Dwrite_chunk.

    Writing through plain ``dset[...] = data`` instead stores chunks
    UNCOMPRESSED (the filter declines the forward pass and HDF5 skips the
    optional filter, marking the chunk's filter mask): reads stay correct,
    but only this function produces compressed chunks.
    """
    import h5py
    if config is None:
        config = EBCCFilterParams(height=data.shape[-2],
                                  width=data.shape[-1]).to_config()
    data = np.asarray(data, np.float32)
    h, w = data.shape[-2], data.shape[-1]
    frames = data.reshape(-1, h, w)
    blob = api.compress(frames, config, error_bound=error_bound)
    from ..codec import container as _c
    frame_bytes = _c.unpack_blob(blob)
    dset = group.create_dataset(
        name, shape=frames.shape, dtype=np.float32, chunks=(1, h, w),
        compression=FILTER_ID, allow_unknown_filter=True)
    for i, fb in enumerate(frame_bytes):
        dset.id.write_direct_chunk((i, 0, 0), fb, filter_mask=0)
    dset.attrs[_ATTR] = json.dumps({"version": 2, "filter": FILTER_ID,
                                    "shape": list(data.shape)})
    return dset
