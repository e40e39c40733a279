"""Side-by-side vote-stability comparison: estimated vs second_estimated.

VERDICT r4 next #2(b): humanoid is the one env where the ensemble vote
demonstrably accepts bad candidates (cost 17.6 -> 55 regressions around
sweeps 60-66 of runs/humanoid_r4).  The reference's remedy is the
held-out validation ensemble vote (`second_estimated`,
/root/reference/model_based_rl.py:287-299).  This script quantifies the
instability of two runs side by side from their committed progress.csv:

- regressions: sweeps where real_current_validation_cost rises more than
  REG_FRAC above the running best so far (vote accepted a policy that is
  much worse on the real env than one it had already found);
- regression magnitude: sum over those sweeps of (cost - running_best);
- vote behaviour: mean vote_frac_worse_last and eval-rejection rate.

Usage:
    python scripts/exp_vote_stability.py runs/humanoid_r4 runs/humanoid_sec \
        [results_humanoid_stability_r5.png]
"""

import csv
import sys

REG_FRAC = 0.5  # a regression = current cost > (1 + REG_FRAC) * running best


def load(path):
    rows = list(csv.DictReader(open(f"{path}/progress.csv")))
    rows.sort(key=lambda r: int(r["Itr"]))
    return rows


def stats(rows, n=None):
    rows = rows[:n] if n else rows
    cur = [float(r["real_current_validation_cost"]) for r in rows]
    best, regress, reg_mag = float("inf"), 0, 0.0
    for c in cur:
        if best < float("inf") and c > (1 + REG_FRAC) * max(best, 1e-9) and c > best + 1.0:
            regress += 1
            reg_mag += c - best
        best = min(best, c)
    votes = [float(r["vote_frac_worse_last"]) for r in rows
             if r.get("vote_frac_worse_last") not in (None, "", "nan")]
    rej = sum(float(r.get("n_rejected_evals", 0) or 0) for r in rows)
    tot = sum(float(r.get("n_policy_evals", 0) or 0) for r in rows)
    return {
        "sweeps": len(rows),
        "first_cost": cur[0],
        "best_cost": min(cur),
        "final_cost": cur[-1],
        "regressions": regress,
        "regress_magnitude": round(reg_mag, 2),
        "mean_vote_frac_worse": round(sum(votes) / max(len(votes), 1), 4),
        "eval_reject_rate": round(rej / max(tot, 1), 4),
    }


def main(run_a, run_b, out_png=None):
    ra, rb = load(run_a), load(run_b)
    # compare at the shared sweep horizon so the side-by-side is fair,
    # and also report each run's full extent
    n = min(len(ra), len(rb))
    print(f"shared horizon: first {n} sweeps")
    for name, rows in ((run_a, ra), (run_b, rb)):
        s_shared, s_full = stats(rows, n), stats(rows)
        print(f"{name}: shared={s_shared}")
        print(f"{name}: full  ={s_full}")
    if out_png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(8, 4.5))
        for name, rows, color in ((run_a, ra, "#3b6fb5"), (run_b, rb, "#c24d3a")):
            it = [int(r["Itr"]) for r in rows]
            c = [float(r["real_current_validation_cost"]) for r in rows]
            mode = "estimated" if "sec" not in name else "second_estimated"
            plt.plot(it, c, color=color, lw=1.2,
                     label=f"{name.split('/')[-1]} ({mode})")
        plt.xlabel("sweep")
        plt.ylabel("real validation cost (lower = better)")
        plt.title("humanoid: single-ensemble vs held-out-ensemble vote")
        plt.legend()
        plt.grid(alpha=0.3)
        plt.tight_layout()
        plt.savefig(out_png, dpi=120)
        print("saved", out_png)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
