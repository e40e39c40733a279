"""Swimmer-domain inner-loop optimizer ranking (VERDICT r4 next #4).

The point2D ranking (scripts/exp_algo_ranking.py, 8 seeds) confirms
trpo best and the trpo > vpg > bptt MEAN/median ordering, but vpg's
heavy upper tail overlaps bptt's band. This runs the same 3-algo
comparison in the MuJoCo domain the reference's claim is actually about
(README.md:15 refers to the locomotion envs) at a fixed small budget:
production Trainer on swimmer, identical seeds/budgets per algo.

CPU-only (forces jax_platforms=cpu); safe next to a live chip job.

    nice -n 19 python scripts/exp_algo_ranking_swimmer.py [--seeds K]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the exclusive TPU

import numpy as np

SWIMMER_SMALL = {
    "algo": "trpo",
    "env": "swimmer",
    "n_models": 3,
    "sample_size": 400,
    "sweep_iters": 4,
    "seed": 0,
    "policy": {"hidden_layers": [32, 32], "output_nonlinearity": "identity"},
    "dynamics_model": {
        "hidden_layers": [128, 128],
        "regularization": {"method": "l2", "constant": 0.0},
        "nonlinearity": ["relu", "relu"],
        "prediction_type": "state_change",
    },
    "dynamics_opt_params": {
        "learning_rate": {"scratch": 1e-3, "refine": 1e-3},
        "batch_size": 200,
        "max_passes": 100,
        "num_passes_threshold": 15,
        "log_every": 10,
        "sample_mode": "random",
        "reinitialize": False,
    },
    "policy_opt_params": {
        "mode": "estimated",
        "whole": True,
        "T": 40,
        "gamma": 1.0,
        "grad_norm_clipping": 10,
        "learning_rate": 1e-3,
        "log_every": 10,
        "num_iters_threshold": 15,
        "max_iters": 60,
        "oracle_maxtimestep": 40,
        "batch_size": 50,
        "sam_mode": "step_rand",
        "stop_critereon": {"offset": 1e-5, "threshold": 0.1,
                           "percent_models_threshold": 0.3},
        "trpo": {"init_std": 1.0, "step_size": 0.01, "batch_size": 2000,
                 "reset": True, "discount": 1.0},
        "vpg": {"init_std": 1.0, "batch_size": 2000, "reset": True,
                "learning_rate": 1e-3},
    },
    "rollout_params": {
        "max_timestep": 40,
        "split_ratio": 0.3,
        "splitting_mode": "trajectory",
    },
}


def run(algo: str, seed: int) -> float:
    import copy

    from metrpo_tpu.config import config_from_dict
    from metrpo_tpu.envs import get_env
    from metrpo_tpu.orchestrator import Trainer

    raw = copy.deepcopy(SWIMMER_SMALL)
    raw["algo"] = algo
    raw["seed"] = seed
    cfg = config_from_dict(raw)
    np.random.seed(seed)
    trainer = Trainer(cfg, get_env("swimmer", seed=seed),
                      lambda: get_env("swimmer", seed=seed),
                      snapshot_dir=None, seed=seed)
    last = None
    for r in trainer.train():
        last = r["real_current_validation_cost"]
    return float(last)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    rows = []
    for algo in ["trpo", "vpg", "bptt"]:
        finals = []
        for seed in range(args.seeds):
            c = run(algo, seed)
            finals.append(c)
            print(f"{algo} seed {seed}: final real cost {c:.2f}", flush=True)
        rows.append({"algo": algo, "mean_final_cost": np.mean(finals),
                     "std_final_cost": np.std(finals),
                     "finals": " ".join(f"{c:.2f}" for c in finals)})

    out = "results_algo_ranking_swimmer.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    ranking = sorted(rows, key=lambda r: r["mean_final_cost"])
    print("swimmer ranking (lower cost = better):",
          " > ".join(r["algo"] for r in ranking))
    print("wrote", out)


if __name__ == "__main__":
    main()
