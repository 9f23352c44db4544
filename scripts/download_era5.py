"""ERA5 download recipes via the CDS API (reference
/root/reference/data/download_era5.py parity; gated on the cdsapi
package + a configured ~/.cdsapirc).

    python scripts/download_era5.py --kind pressure --out era5_pl.nc
    python scripts/download_era5.py --kind surface --out era5_sfc.nc
"""

import argparse
import sys

PRESSURE_LEVELS = ["1000", "975", "950", "925", "900", "875", "850", "825",
                   "800", "775", "750", "700", "650", "600", "550", "500",
                   "450", "400", "350", "300", "250", "225", "200", "175",
                   "150", "125", "100", "70", "50", "30", "20", "10", "7",
                   "5", "3", "2", "1"]  # the 37-level stack

PRESSURE_VARS = ["geopotential", "temperature", "specific_humidity",
                 "u_component_of_wind", "v_component_of_wind",
                 "vertical_velocity"]

SURFACE_VARS = ["10m_u_component_of_wind", "10m_v_component_of_wind",
                "2m_temperature", "mean_sea_level_pressure",
                "toa_incident_solar_radiation", "total_precipitation"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", choices=["pressure", "surface", "ensemble"],
                   default="pressure")
    p.add_argument("--year", default="2024")
    p.add_argument("--month", default="03")
    p.add_argument("--days", nargs="+", default=["01", "02"])
    p.add_argument("--times", nargs="+", default=["00:00"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    try:
        import cdsapi
    except ImportError:
        print("cdsapi is not installed (pip install cdsapi and configure "
              "~/.cdsapirc with your CDS credentials)", file=sys.stderr)
        return 1

    client = cdsapi.Client()
    common = {
        "year": [args.year], "month": [args.month], "day": args.days,
        "time": args.times, "data_format": "netcdf",
    }
    if args.kind == "pressure":
        dataset = "reanalysis-era5-pressure-levels"
        request = {"product_type": ["reanalysis"],
                   "variable": PRESSURE_VARS,
                   "pressure_level": PRESSURE_LEVELS, **common}
        target = args.out or "era5_pl_sample.nc"
    elif args.kind == "surface":
        dataset = "reanalysis-era5-single-levels"
        request = {"product_type": ["reanalysis"],
                   "variable": SURFACE_VARS, **common}
        target = args.out or "era5_sfc_sample.nc"
    else:
        # ensemble spread: the per-point error-bound source for the
        # pointwise workflow (interpolate with ebcc_tpu.dataprep)
        dataset = "reanalysis-era5-single-levels"
        request = {"product_type": ["ensemble_spread"],
                   "variable": SURFACE_VARS, **common}
        target = args.out or "era5_spread_sample.nc"
    client.retrieve(dataset, request, target)
    print(f"wrote {target}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
