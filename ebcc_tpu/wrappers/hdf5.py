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
from ..codec.config import EBCCConfig, ResidualMode

_ATTR = "ebcc_tpu"

_MODE_NAMES = {
    "none": ResidualMode.NONE,
    "sparsification_factor": ResidualMode.SPARSIFICATION_FACTOR,
    "max_error": ResidualMode.MAX_ERROR,
    "relative_error": ResidualMode.RELATIVE_ERROR,
    "pointwise_max_error": ResidualMode.POINTWISE_MAX_ERROR,
}


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
