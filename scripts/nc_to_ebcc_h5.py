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

    stats = []
    with h5py.File(args.input, "r") as src, \
            h5py.File(args.output, "w") as dst:
        def visit(name, obj):
            if isinstance(obj, h5py.Group):
                g = dst.require_group(name)
                g.attrs.update(obj.attrs)
                return
            if (obj.dtype.kind == "f" and obj.ndim >= 2 and
                    obj.shape[-1] >= 4 and obj.shape[-2] >= 4):
                data = np.asarray(obj[...], np.float32)
                params = whdf5.EBCCFilterParams(
                    base_cr=args.base_cr, height=data.shape[-2],
                    width=data.shape[-1], data_dim=data.ndim,
                    residual_opt=(mode_name, args.error))
                t0 = time.perf_counter()
                if args.device:
                    d = whdf5.write_filtered_dataset(
                        dst.require_group(os.path.dirname(name) or "/"),
                        os.path.basename(name), data, params.to_config())
                else:
                    d = whdf5.create_filtered_dataset(
                        dst, name, data.shape, params)
                    d[...] = data
                dt = time.perf_counter() - t0
                stored = d.id.get_storage_size()
                stats.append(dict(name=name, bytes=int(stored),
                                  cr=data.nbytes / max(stored, 1),
                                  seconds=round(dt, 2)))
                print(json.dumps(stats[-1]))
            else:
                d = dst.create_dataset(name, data=obj[...])
            d.attrs.update(obj.attrs)

        src.visititems(visit)
        dst.attrs.update(src.attrs)
    total_cr = (sum(s["bytes"] / s["cr"] for s in stats) /
                max(sum(s["bytes"] for s in stats), 1))
    print(json.dumps({"datasets": len(stats),
                      "output_bytes": os.path.getsize(args.output)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
