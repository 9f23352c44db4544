"""Spatial error-map plots: reconstruction error over the lat/lon grid.

Parity with the reference's map visualisations
(/root/reference/scripts/delta_compression/run.py cartopy panels and
plot_aurora_delta_results.py): compress a frame, decompress, and plot the
field + the signed error on a geographic grid.  Uses cartopy coastlines
when available, plain lat/lon axes otherwise (cartopy is not in this
image).

    python scripts/plot_error_map.py [frame.npy] --error 0.5 --out map.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", nargs="?",
                   default="/root/reference/data/test_data.npy")
    p.add_argument("--error", type=float, default=0.5)
    p.add_argument("--out", default="error_map.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import ebcc_tpu
    from ebcc_tpu import EBCCConfig, ResidualMode

    data = np.load(args.input).astype(np.float32)
    data = data.reshape(-1, data.shape[-1])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=args.error,
                     base_cr=100, max_batch=1)
    blob = ebcc_tpu.compress(data, cfg)
    rec = ebcc_tpu.decompress(blob, cfg).reshape(data.shape)
    err = rec - data
    h, w = data.shape
    lats = np.linspace(90, -90, h)
    lons = np.linspace(0, 360, w, endpoint=False)

    try:
        import cartopy.crs as ccrs
        proj = dict(projection=ccrs.PlateCarree(central_longitude=180))
    except ImportError:
        proj = {}

    fig, axes = plt.subplots(2, 1, figsize=(11, 9), subplot_kw=proj)
    for ax, field, title, cmap in (
            (axes[0], data, "original", "viridis"),
            (axes[1], err, f"reconstruction error (bound {args.error}, "
                           f"CR {data.nbytes / len(blob):.1f}x)", "RdBu_r")):
        kw = {}
        if proj:
            import cartopy.crs as ccrs
            ax.coastlines(linewidth=0.4)
            kw["transform"] = ccrs.PlateCarree()
        vmax = args.error if field is err else None
        pm = ax.pcolormesh(lons, lats, field, cmap=cmap,
                           vmin=-vmax if vmax else None, vmax=vmax, **kw)
        fig.colorbar(pm, ax=ax, shrink=0.8)
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}  (max |err| = {np.abs(err).max():.4f})")


if __name__ == "__main__":
    main()
