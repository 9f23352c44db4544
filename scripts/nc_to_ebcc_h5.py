"""Convert a netCDF/HDF5 file into an EBCC-TPU-filtered HDF5 file.

Parity with the reference's conversion layer
(/root/reference/scripts/xarray_to_hdf5.py + hdf5_compression.py): every
float dataset with >= 2 trailing spatial dims is rewritten through the
EBCC-TPU HDF5 filter; everything else (coordinates, attributes) is copied
verbatim.  netCDF4 files ARE HDF5, so h5py reads them directly (xarray is
not required and not in this image).

    python scripts/nc_to_ebcc_h5.py in.nc out.h5 --mode relative_error --error 0.009
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--mode", default="relative_error",
                   choices=["max_error", "relative_error"])
    p.add_argument("--error", type=float, default=0.009)
    p.add_argument("--base-cr", type=float, default=100.0)
    p.add_argument("--device", action="store_true",
                   help="compress on the device (write_filtered_dataset) "
                        "instead of through the plugin's CPU encoder")
    args = p.parse_args()

    import h5py

    from ebcc_tpu.wrappers import hdf5 as whdf5
    whdf5.register_plugin_path()
    mode_name = {"max_error": "max_error_target",
                 "relative_error": "relative_error_target"}[args.mode]

    def copy_attrs(src_obj, dst_obj):
        """Copy attributes, skipping HDF5 object-reference attrs
        (netCDF's DIMENSION_LIST/REFERENCE_LIST point at objects of the
        SOURCE file; copying the raw references would leave dangling
        tokens in the output)."""
        for k in src_obj.attrs:
            try:
                if h5py.check_ref_dtype(src_obj.attrs.get_id(k).dtype):
                    continue
            except Exception:
                pass
            v = src_obj.attrs[k]
            if isinstance(v, h5py.Reference) or (
                    isinstance(v, np.ndarray) and v.dtype == object):
                continue
            dst_obj.attrs[k] = v

    stats = []
    with h5py.File(args.input, "r") as src, \
            h5py.File(args.output, "w") as dst:
        def visit(name, obj):
            if isinstance(obj, h5py.Group):
                copy_attrs(obj, dst.require_group(name))
                return
            if not isinstance(obj, h5py.Dataset):
                # committed datatypes etc. — nothing to copy
                print(f"skipping non-dataset object {name!r}",
                      file=sys.stderr)
                return
            if (obj.dtype.kind == "f" and obj.ndim >= 2 and
                    obj.shape[-1] >= 4 and obj.shape[-2] >= 4):
                data = np.asarray(obj[...], np.float32)
                params = whdf5.EBCCFilterParams(
                    base_cr=args.base_cr, height=data.shape[-2],
                    width=data.shape[-1], data_dim=data.ndim,
                    residual_opt=(mode_name, args.error))
                t0 = time.perf_counter()
                # the dataset keeps the source SHAPE in both modes; only
                # where the chunks are compressed differs
                d = whdf5.create_filtered_dataset(dst, name, data.shape,
                                                  params)
                if args.device:
                    from ebcc_tpu import api
                    from ebcc_tpu.codec import container as _c
                    h, w = data.shape[-2], data.shape[-1]
                    blob = api.compress(data, params.to_config())
                    for idx, fb in zip(np.ndindex(data.shape[:-2]),
                                       _c.unpack_blob(blob)):
                        d.id.write_direct_chunk((*idx, 0, 0), fb,
                                                filter_mask=0)
                else:
                    d[...] = data  # plugin CPU encoder per chunk
                dt = time.perf_counter() - t0
                stored = d.id.get_storage_size()
                stats.append(dict(name=name, bytes=int(stored),
                                  raw_bytes=int(data.nbytes),
                                  cr=data.nbytes / max(stored, 1),
                                  seconds=round(dt, 2)))
                print(json.dumps(stats[-1]))
            else:
                d = dst.create_dataset(name, data=obj[...])
            copy_attrs(obj, d)

        src.visititems(visit)
        copy_attrs(src, dst)
    total_raw = sum(s["raw_bytes"] for s in stats)
    total_stored = sum(s["bytes"] for s in stats)
    print(json.dumps({"datasets": len(stats),
                      "total_cr": total_raw / max(total_stored, 1),
                      "output_bytes": os.path.getsize(args.output)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
