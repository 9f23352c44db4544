"""CDO/netCDF ecosystem integration: drive `cdo --filter` through the
write-capable plugin 33076, the way the reference proves its ecosystem
contract (/root/reference/data/test_netcdf.sh:1-6, pinned string
data/myfilter:1).

Gated on a `cdo` binary being installed (it is not part of this image);
the in-process libhdf5 forward-filter path the same plugin serves is
covered unconditionally by tests/test_cpu_encoder.py.  CDO generates its
own input netCDF here (`cdo random`), so the test needs no netCDF4 python
package and no fixture files.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

_CDO = shutil.which("cdo")
_PLUGIN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_PLUGIN = os.path.join(_PLUGIN_DIR, "libh5z_ebcc_tpu.so")

pytestmark = [
    pytest.mark.skipif(_CDO is None, reason="cdo not installed"),
    pytest.mark.skipif(not os.path.exists(_PLUGIN),
                       reason="plugin not built (make -C native)"),
]

# r144x72: lon=144, lat=72 -> variable dims (time, lat=72, lon=144)
H, W = 72, 144
BOUND = 0.02  # uniform-[0,1] data from `cdo random`


def _cdo(*args, **kw):
    env = {**os.environ, "HDF5_PLUGIN_PATH": _PLUGIN_DIR, **kw.pop("env", {})}
    r = subprocess.run([_CDO, "-s", "-f", "nc4", "-b", "F32", *args],
                       capture_output=True, text=True, env=env, **kw)
    assert r.returncode == 0, f"cdo {' '.join(args)} failed:\n{r.stderr}"
    return r


def _read_var(path):
    """The data variable of a netCDF4/HDF5 file, via h5py + the plugin."""
    import h5py

    from ebcc_tpu.wrappers import hdf5 as whdf5
    whdf5.register_plugin_path()
    with h5py.File(path, "r") as f:
        aux = ("lat", "lon", "time", "bnds", "bounds", "vertices")
        for k in f:
            if k not in aux and getattr(f[k], "ndim", 0) >= 2:
                return (np.asarray(f[k][:], np.float32),
                        f[k].id.get_storage_size(),
                        [flt[0] for flt in (f[k]._filters or {}).items()])
    raise AssertionError(f"no data variable found in {path}")


def test_cdo_filter_copy_roundtrip(tmp_path):
    """`cdo --filter <id,cd_values...> copy in.nc out.nc` must compress
    through plugin 33076 and the output must honour the max-error bound
    (reference flow: data/test_netcdf.sh + filter_wrapper.py:133-140)."""
    pytest.importorskip("h5py")
    from ebcc_tpu.wrappers.hdf5 import EBCCFilterParams

    params = EBCCFilterParams(height=H, width=W, base_cr=20.0,
                              residual_opt=("max_error", BOUND))
    fstring = params.cdo_filter_string()
    assert fstring.startswith("33076,")

    src = tmp_path / "in.nc"
    out = tmp_path / "out.nc"
    _cdo(f"random,r{W}x{H},7", str(src))
    _cdo("--filter", fstring, "copy", str(src), str(out))

    ref, _, _ = _read_var(src)
    dec, storage, filters = _read_var(out)
    assert dec.shape[-2:] == (H, W)
    assert float(np.abs(dec.astype(np.float64) -
                        ref.astype(np.float64)).max()) <= BOUND
    # the chunks must actually have gone through the filter, and compress
    assert "33076" in " ".join(str(f) for f in filters)
    assert storage < ref.nbytes


def test_cli_filter_string_is_cdo_ready(tmp_path):
    """The CLI's filter-string output is exactly what `cdo --filter`
    accepts (reference: filter_wrapper.py CLI -> data/myfilter:1)."""
    from ebcc_tpu.wrappers.hdf5 import EBCCFilterParams

    r = subprocess.run(
        [sys.executable, "-m", "ebcc_tpu", "filter-string",
         "--height", str(H), "--width", str(W), "--base-cr", "20",
         "--mode", "max_error", "--error", str(BOUND)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    params = EBCCFilterParams(height=H, width=W, base_cr=20.0,
                              residual_opt=("max_error", BOUND))
    assert params.cdo_filter_string() in r.stdout

    src = tmp_path / "in.nc"
    out = tmp_path / "out.nc"
    _cdo(f"random,r{W}x{H},3", str(src))
    _cdo("--filter", params.cdo_filter_string(), "copy", str(src), str(out))
    assert out.exists() and out.stat().st_size > 0
