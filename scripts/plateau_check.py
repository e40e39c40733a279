"""Plateau detector for the chip-schedule watchdog (VERDICT r4 next #1).

Exit 0 (plateau) iff a run's progress.csv shows the judge's stop
condition: the climb has visibly flattened — running-best
real_policy_mean_min_validation_cost improved by < FRAC of |best| over
the trailing WINDOW sweeps — after at least MIN_SWEEPS total sweeps.
Exit 1 otherwise.  Pure-CSV, no jax import: safe next to a live chip job.

Usage: python scripts/plateau_check.py runs/ant_ref [min_sweeps] [window] [frac]
"""

import csv
import sys


def plateaued(csv_path, min_sweeps=115, window=15, frac=0.02):
    try:
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
    except OSError:
        return False
    costs = [float(r["real_policy_mean_min_validation_cost"]) for r in rows
             if r.get("real_policy_mean_min_validation_cost")]
    if len(costs) < max(min_sweeps, window + 1):
        return False
    best = []
    for c in costs:  # running best (costs are negative returns: lower=better)
        best.append(min(best[-1], c) if best else c)
    improvement = best[-(window + 1)] - best[-1]
    return improvement < frac * abs(best[-1])


if __name__ == "__main__":
    d = sys.argv[1]
    args = [int(sys.argv[2]) if len(sys.argv) > 2 else 115,
            int(sys.argv[3]) if len(sys.argv) > 3 else 15,
            float(sys.argv[4]) if len(sys.argv) > 4 else 0.02]
    sys.exit(0 if plateaued(f"{d}/progress.csv", *args) else 1)
