"""Plot real_current_validation_cost (as return = -cost) from a run's
progress.csv."""

import csv
import sys


def main(path, out):
    rows = list(csv.DictReader(open(path)))
    sweeps = [int(r["Itr"]) for r in rows]
    returns = [-float(r["real_current_validation_cost"]) for r in rows]
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(figsize=(7, 4))
    plt.plot(sweeps, returns, marker="o", ms=3)
    plt.xlabel("sweep (3000 real env steps each)")
    plt.ylabel("real validation return")
    plt.title("ME-TRPO learning curve")
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print("saved", out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "curve.png")
