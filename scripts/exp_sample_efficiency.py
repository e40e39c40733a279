"""Sample-efficiency comparator: ME-TRPO vs model-free TRPO.

Backs BASELINE.md row 1 (the reference README's headline claim, README.md:4:
"same final performance with 100x less data" vs model-free RL *on MuJoCo
domains*, arXiv 1802.10592). Both sides use the SAME policy network, TRPO
update program and real environment; the only difference is whether
gradients come from imagined ensemble rollouts (ME-TRPO) or raw real-env
batches (model-free, batch_polopt.py:145-235 analog in
metrpo_tpu/model_free.py).

Modes:
  python scripts/exp_sample_efficiency.py            # point2D, both sides
  python scripts/exp_sample_efficiency.py swimmer    # MuJoCo domain:
    model-free TRPO trains here (CPU); the ME-TRPO side is read from the
    committed TPU swimmer runs' progress.csv (runs/swimmer_s*/ — reference
    hyperparameters, 3000 real steps/sweep), so the comparison is measured
    on the same env/seed family the parity curves come from.

CPU-only (see CLAUDE.md TPU-exclusivity note).
Writes results_sample_efficiency[_swimmer].csv and prints a summary table.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrpo_tpu.config import PolicyModelParams, load_config
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.model_free import train_model_free
from metrpo_tpu.orchestrator import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results_sample_efficiency.csv")

MB_SWEEPS = 6                # ME-TRPO: 6 sweeps x 500 real steps = 3k steps
MF_ITERS = 60                # model-free: 60 iters x 5000 steps = 300k steps
MF_BATCH = 5000              # = 100x the ME-TRPO real-data budget


def run_me_trpo():
    cfg = load_config(os.path.join(REPO, "params/params-point2D.json"),
                      overrides={"algo": "trpo", "sweep_iters": MB_SWEEPS})
    np.random.seed(0)
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=None)
    rows = []
    for r in trainer.train(sweep_iters=MB_SWEEPS):
        steps = r["sweep"] * cfg.sample_size
        rows.append(("me-trpo", r["sweep"], steps,
                     -float(r["real_current_validation_cost"])))
        print(f"[me-trpo] sweep {r['sweep']} real_steps {steps} "
              f"return {rows[-1][3]:.2f}", flush=True)
    return rows


def run_model_free():
    env = Point2DEnv()
    _, curve = train_model_free(
        env, Point2DEnv, PolicyModelParams(hidden_layers=(32, 32)),
        algo="trpo", n_itr=MF_ITERS, batch_size=MF_BATCH,
        max_path_length=10, discount=1.0, seed=0)
    rows = []
    for itr, ret in enumerate(curve):
        rows.append(("model-free-trpo", itr + 1, (itr + 1) * MF_BATCH,
                     float(ret)))
    print(f"[model-free] first {curve[0]:.2f} best {max(curve):.2f} "
          f"final {curve[-1]:.2f}", flush=True)
    return rows


SWIMMER_OUT = os.path.join(REPO, "results_sample_efficiency_swimmer.csv")
SWIMMER_MF_ITERS = 720          # 720 x 5000 = 3.6M real steps (100x the
SWIMMER_MF_BATCH = 5000         # 36k the TPU ME-TRPO runs converge in)
SWIMMER_T = 200                 # params-swimmer.json horizon


def read_me_trpo_swimmer():
    """ME-TRPO side from the committed TPU runs (reference hyperparams)."""
    import csv
    import glob
    rows = []
    for d in sorted(glob.glob(os.path.join(REPO, "runs/swimmer_s*"))):
        path = os.path.join(d, "progress.csv")
        if not os.path.isfile(path):
            continue
        name = f"me-trpo-{os.path.basename(d)}"
        for i, r in enumerate(csv.DictReader(open(path))):
            steps = int(float(r["TimeStepsCollected"]))
            tot = (rows[-1][2] + steps if rows and rows[-1][0] == name
                   else steps)
            rows.append((name, i + 1, tot,
                         -float(r["real_current_validation_cost"])))
    return rows


def run_model_free_swimmer(n_itr=SWIMMER_MF_ITERS):
    from metrpo_tpu.envs import get_env
    env = get_env("swimmer")
    factory = lambda: get_env("swimmer")
    rows = []

    def cb(itr, ret):
        rows.append(("model-free-trpo", itr, itr * SWIMMER_MF_BATCH,
                     float(ret)))
        if itr % 10 == 0 or itr == 1:
            print(f"[model-free swimmer] iter {itr} "
                  f"steps {itr * SWIMMER_MF_BATCH} return {ret:.2f}",
                  flush=True)
            flush_csv(rows)

    def flush_csv(mf_rows):
        with open(SWIMMER_OUT, "w") as f:
            f.write("method,iteration,real_env_steps,avg_return\n")
            for row in read_me_trpo_swimmer() + mf_rows:
                f.write(",".join(str(x) for x in row) + "\n")

    _, curve = train_model_free(
        env, factory, PolicyModelParams(hidden_layers=(32, 32)),
        algo="trpo", n_itr=n_itr, batch_size=SWIMMER_MF_BATCH,
        max_path_length=SWIMMER_T, discount=0.99, seed=0,
        progress_callback=cb)
    flush_csv(rows)
    return rows


def main_swimmer(n_itr=SWIMMER_MF_ITERS):
    t0 = time.time()
    mb = read_me_trpo_swimmer()
    if not mb:
        print("no runs/swimmer_s*/progress.csv yet — the ME-TRPO side "
              "comes from the TPU runs; continuing with model-free only")
    mf = run_model_free_swimmer(n_itr)
    if mb:
        # compare against the best per-run final return of the TPU curves
        finals = {}
        for name, _, steps, ret in mb:
            finals[name] = (steps, ret)
        print("\n=== swimmer sample-efficiency summary ===")
        for name, (steps, ret) in finals.items():
            best = max(r[3] for r in mb if r[0] == name)
            reach = next((r for r in mf if r[3] >= best), None)
            if reach:
                print(f"{name}: best return {best:.1f} in <= {steps} steps; "
                      f"model-free reaches it after {reach[2]} steps "
                      f"-> {reach[2] / steps:.0f}x more data")
            else:
                mf_best = max(r[3] for r in mf)
                print(f"{name}: best return {best:.1f} in <= {steps} steps; "
                      f"model-free best {mf_best:.1f} after {mf[-1][2]} "
                      f"steps -> >{mf[-1][2] / steps:.0f}x more data needed")
    print(f"wrote {SWIMMER_OUT} ({time.time() - t0:.0f}s)")


def main():
    t0 = time.time()
    mb = run_me_trpo()
    mf = run_model_free()
    with open(OUT, "w") as f:
        f.write("method,iteration,real_env_steps,avg_return\n")
        for row in mb + mf:
            f.write(",".join(str(x) for x in row) + "\n")

    mb_final = mb[-1][3]
    mb_steps = mb[-1][2]
    # first model-free iteration whose return reaches the ME-TRPO final
    reach = next((r for r in mf if r[3] >= mb_final), None)
    print("\n=== sample-efficiency summary ===")
    print(f"ME-TRPO: return {mb_final:.2f} after {mb_steps} real steps")
    if reach:
        print(f"model-free TRPO reaches {reach[3]:.2f} after {reach[2]} real "
              f"steps -> {reach[2] / mb_steps:.0f}x more data")
    else:
        print(f"model-free TRPO never reaches {mb_final:.2f} within "
              f"{mf[-1][2]} real steps (best {max(r[3] for r in mf):.2f}) "
              f"-> >{mf[-1][2] / mb_steps:.0f}x more data needed")
    print(f"wrote {OUT} ({time.time() - t0:.0f}s)")


def merge_swimmer_only():
    """Re-merge the ME-TRPO side (runs/swimmer_s*/progress.csv) with the
    already-recorded model-free rows and print the summary — used after
    the TPU swimmer runs land, without re-training model-free."""
    import csv
    mf = []
    if os.path.isfile(SWIMMER_OUT):
        for r in csv.DictReader(open(SWIMMER_OUT)):
            if r["method"] == "model-free-trpo":
                mf.append((r["method"], int(r["iteration"]),
                           int(r["real_env_steps"]), float(r["avg_return"])))
    mb = read_me_trpo_swimmer()
    with open(SWIMMER_OUT, "w") as f:
        f.write("method,iteration,real_env_steps,avg_return\n")
        for row in mb + mf:
            f.write(",".join(str(x) for x in row) + "\n")
    print(f"merged {len(mb)} me-trpo rows + {len(mf)} model-free rows")
    names = sorted({r[0] for r in mb})
    for name in names:
        pts = [r for r in mb if r[0] == name]
        best = max(r[3] for r in pts)
        steps = pts[-1][2]
        reach = next((r for r in mf if r[3] >= best), None)
        if reach:
            print(f"{name}: best return {best:.1f} in <= {steps} steps; "
                  f"model-free reaches it after {reach[2]} steps "
                  f"-> {reach[2] / steps:.1f}x more data")
        else:
            mf_best = max((r[3] for r in mf), default=float("nan"))
            print(f"{name}: best return {best:.1f} in <= {steps} steps; "
                  f"model-free best {mf_best:.1f} after "
                  f"{mf[-1][2] if mf else 0} steps (never reaches it)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "swimmer":
        if len(sys.argv) > 2 and sys.argv[2] == "merge":
            merge_swimmer_only()
        else:
            n = int(sys.argv[2]) if len(sys.argv) > 2 else SWIMMER_MF_ITERS
            main_swimmer(n)
    else:
        main()
