"""Plot per-step predictive-vs-direct compressed sizes.

Parity with /root/reference/scripts/delta_compression/
plot_aurora_delta_results.py: per-time-step compressed size of the
forecast-predictive pipeline against the all-direct baseline, from the CSV
written by ``run_predictive.py --out``.
"""

import argparse
import csv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv", help="per-step CSV from run_predictive.py --out")
    p.add_argument("--out", default="predictive_steps.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(csv.DictReader(open(args.csv)))
    steps = [int(r["step"]) for r in rows]
    pred = [int(r["predictive_bytes"]) / 1e3 for r in rows]
    direct = [int(r["direct_bytes"]) / 1e3 for r in rows]
    warm = [s for s, r in zip(steps, rows) if r["predictive"] != "True"]

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(steps, direct, "o-", label="direct (every step)")
    ax.plot(steps, pred, "s-", label="predictive pipeline")
    if warm:
        ax.axvspan(min(warm) - 0.5, max(warm) + 0.5, alpha=0.12,
                   label="warmup (direct)")
    ax.set_xlabel("time step")
    ax.set_ylabel("compressed size [kB]")
    ax.set_title("Forecast-predictive vs direct compression per step")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
