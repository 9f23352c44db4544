"""Plot sweep results (CR vs bound, throughput).

Equivalent of the reference plotting layer (scripts/plot_compression.py,
scan_cratio/plot_*.py): reads the CSV written by compression_sweep.py and
renders bar/line charts with matplotlib.
"""

import argparse

import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--out", default="sweep.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(args.csv)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))

    lossy = df[df.error_target > 0]
    lossless = df[df.error_target == 0]
    for m, grp in lossy.groupby("method"):
        axes[0].plot(grp.error_target, grp.cr, "o-", label=m)
    for _, row in lossless.iterrows():
        axes[0].axhline(row.cr, ls="--", lw=1, alpha=0.6)
        axes[0].annotate(row.method, (lossy.error_target.min(), row.cr),
                         fontsize=8, va="bottom")
    axes[0].set_xlabel("error bound")
    axes[0].set_ylabel("compression ratio")
    axes[0].set_xscale("log")
    axes[0].set_yscale("log")
    axes[0].legend()
    axes[0].set_title("CR vs bound")

    if "encode_s" in df:
        axes[1].plot(lossy.error_target, lossy.encode_s, "o-",
                     label="encode")
        axes[1].plot(lossy.error_target, lossy.decode_s, "s-",
                     label="decode")
        axes[1].set_xlabel("error bound")
        axes[1].set_ylabel("seconds")
        axes[1].set_xscale("log")
        axes[1].legend()
        axes[1].set_title("wall time")

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
