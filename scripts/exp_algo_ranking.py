"""Inner-loop optimizer ranking check: trpo > vpg > bptt (BASELINE.md row;
reference README.md:15 "TRPO gives the best result, while BPTT performs
the worst").

Runs the production Trainer on point2D with each inner-loop optimizer at
identical seeds/budgets (CPU-safe: forces jax_platforms=cpu in-process)
and reports the final real validation cost per algo, plus the induced
ranking. Writes results_algo_ranking.csv + prints a summary.

    nice -n 19 python scripts/exp_algo_ranking.py [--sweeps N] [--seeds K]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the exclusive TPU

import numpy as np


def run(algo: str, seed: int, sweeps: int) -> float:
    from metrpo_tpu.config import load_config
    from metrpo_tpu.envs import get_env
    from metrpo_tpu.envs.point2d import Point2DEnv
    from metrpo_tpu.orchestrator import Trainer

    cfg = load_config(
        "params/params-point2D.json",
        overrides={"algo": algo, "sweep_iters": sweeps,
                   "dynamics_opt_params": {"max_passes": 200},
                   "policy_opt_params": {"max_iters": 150}})
    np.random.seed(seed)
    trainer = Trainer(cfg, get_env("point2D"), Point2DEnv,
                      snapshot_dir=None, seed=seed)
    last = None
    for r in trainer.train(sweep_iters=sweeps):
        last = r["real_current_validation_cost"]
    return float(last)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    algos = ["trpo", "vpg", "bptt"]
    rows = []
    for algo in algos:
        finals = []
        for seed in range(args.seeds):
            c = run(algo, seed, args.sweeps)
            finals.append(c)
            print(f"{algo} seed {seed}: final real cost {c:.2f}", flush=True)
        rows.append({"algo": algo, "mean_final_cost": np.mean(finals),
                     "std_final_cost": np.std(finals),
                     "finals": " ".join(f"{c:.2f}" for c in finals)})

    out = "results_algo_ranking.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    ranking = sorted(rows, key=lambda r: r["mean_final_cost"])
    print("ranking (lower cost = better):",
          " > ".join(r["algo"] for r in ranking))
    print("wrote", out)


if __name__ == "__main__":
    main()
