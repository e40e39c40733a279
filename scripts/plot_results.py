"""Render RESULTS.md figures from run CSVs.

Styling follows the dataviz reference instance (validated categorical
slots 1-2: blue #2a78d6, orange #eb6834 — used unchanged from the
pre-validated palette; node is unavailable in this image so the palette
validator could not be re-run here), 2px lines, recessive grid, single
axis, legend only when >=2 series.

Usage:
    python scripts/plot_results.py                      # all figures
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# categorical slots 1-3 of the validated reference palette (the first
# three slots validate all-pairs for CVD separation)
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
INK, MUTED, SURFACE = "#3a3a38", "#8a8a86", "#fcfcfb"


def style_axes(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(MUTED)
    ax.tick_params(colors=INK, labelsize=9)
    ax.grid(True, color="#e8e8e5", linewidth=0.7, zorder=0)
    ax.set_axisbelow(True)


def plot_learning_curve(progress_csv, out_png, title, xcol="Itr",
                        ycol="real_current_validation_cost"):
    if not os.path.isfile(progress_csv):
        print("skip (missing):", progress_csv)
        return
    rows = list(csv.DictReader(open(progress_csv)))
    xs = [int(float(r[xcol])) for r in rows]
    ys = [-float(r[ycol]) for r in rows]  # return = -cost
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    style_axes(ax)
    ax.plot(xs, ys, color=BLUE, linewidth=2, zorder=3)
    ax.set_xlabel("sweep (3000 real transitions each)", color=INK, fontsize=10)
    ax.set_ylabel("real validation return", color=INK, fontsize=10)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    # direct label on the final point
    ax.annotate(f"{ys[-1]:.0f}", (xs[-1], ys[-1]), textcoords="offset points",
                xytext=(4, 4), fontsize=9, color=INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out_png, f"({len(xs)} sweeps, final return {ys[-1]:.1f})")


def plot_sample_efficiency(out_png):
    src = os.path.join(REPO, "results_sample_efficiency.csv")
    if not os.path.isfile(src):
        print("skip (missing):", src)
        return
    rows = list(csv.DictReader(open(src)))
    series = {}
    for r in rows:
        series.setdefault(r["method"], []).append(
            (int(r["real_env_steps"]), float(r["avg_return"])))
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    style_axes(ax)
    colors = {"me-trpo": BLUE, "model-free-trpo": ORANGE}
    names = {"me-trpo": "ME-TRPO (this framework)",
             "model-free-trpo": "model-free TRPO"}
    for method, pts in series.items():
        xs, ys = zip(*sorted(pts))
        ax.plot(xs, ys, color=colors[method], linewidth=2,
                label=names[method], zorder=3)
    ax.set_xscale("log")
    ax.set_xlabel("real environment steps (log scale)", color=INK, fontsize=10)
    ax.set_ylabel("average return", color=INK, fontsize=10)
    ax.set_title("point2D: same policy + TRPO update, real vs imagined data",
                 color=INK, fontsize=11, loc="left")
    leg = ax.legend(frameon=False, fontsize=9, loc="lower right")
    for t in leg.get_texts():
        t.set_color(INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out_png)


def _read_returns(progress_csv):
    rows = list(csv.DictReader(open(progress_csv)))
    return ([int(float(r["Itr"])) for r in rows],
            [-float(r["real_current_validation_cost"]) for r in rows])


def plot_seed_band(runs, title, out_png):
    """Seed-variance figure: per-seed curves + the min-max band
    (BASELINE 'within seed variance' comparator).  ``runs`` is a list of
    (seed, progress_csv) pairs."""
    series = [(s, *_read_returns(p)) for s, p in runs if os.path.isfile(p)]
    if len(series) < 2:
        print("skip seed band (need >=2 runs):", out_png)
        return
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    style_axes(ax)
    colors = {0: BLUE, 1: ORANGE, 2: AQUA}
    n = min(len(xs) for _, xs, _ in series)
    if n > 1:
        lo = [min(ys[i] for _, _, ys in series) for i in range(n)]
        hi = [max(ys[i] for _, _, ys in series) for i in range(n)]
        ax.fill_between(range(1, n + 1), lo, hi, color=BLUE, alpha=0.12,
                        linewidth=0, zorder=2, label="seed min-max band")
    for s, xs, ys in series:
        ax.plot(xs, ys, color=colors[s], linewidth=2, zorder=3,
                label=f"seed {s}")
        ax.annotate(f"{ys[-1]:.0f}", (xs[-1], ys[-1]),
                    textcoords="offset points", xytext=(4, 2),
                    fontsize=9, color=INK)
    ax.set_xlabel("sweep (3000 real transitions each)", color=INK, fontsize=10)
    ax.set_ylabel("real validation return", color=INK, fontsize=10)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    leg = ax.legend(frameon=False, fontsize=9, loc="lower right")
    for t in leg.get_texts():
        t.set_color(INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out_png)


def plot_sample_efficiency_swimmer(out_png):
    src = os.path.join(REPO, "results_sample_efficiency_swimmer.csv")
    if not os.path.isfile(src):
        print("skip (missing):", src)
        return
    rows = list(csv.DictReader(open(src)))
    series = {}
    for r in rows:
        series.setdefault(r["method"], []).append(
            (int(r["real_env_steps"]), float(r["avg_return"])))
    if not any(m.startswith("me-trpo") for m in series):
        print("skip swimmer sample-efficiency (no me-trpo side yet)")
        return
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    style_axes(ax)
    seen_me = False
    for method, pts in sorted(series.items()):
        xs, ys = zip(*sorted(pts))
        if method.startswith("me-trpo"):
            # one color for the ME-TRPO seed family (same entity)
            ax.plot(xs, ys, color=BLUE, linewidth=2, zorder=3,
                    label=None if seen_me else "ME-TRPO (seeds 0-2)")
            seen_me = True
        else:
            ax.plot(xs, ys, color=ORANGE, linewidth=2, zorder=3,
                    label="model-free TRPO")
    ax.set_xscale("log")
    ax.set_xlabel("real environment steps (log scale)", color=INK, fontsize=10)
    ax.set_ylabel("average return", color=INK, fontsize=10)
    ax.set_title("swimmer: same policy + TRPO update, real vs imagined data",
                 color=INK, fontsize=11, loc="left")
    leg = ax.legend(frameon=False, fontsize=9, loc="lower right")
    for t in leg.get_texts():
        t.set_color(INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out_png)


def main():
    plot_learning_curve(
        os.path.join(REPO, "runs/cheetah_r3/progress.csv"),
        os.path.join(REPO, "results_cheetah_r3.png"),
        "half-cheetah, unmodified reference hyperparameters, one TPU v5e chip")
    plot_learning_curve(
        os.path.join(REPO, "runs/ant_ref/progress.csv"),
        os.path.join(REPO, "results_ant_r3.png"),
        "ant (analytic is_done masking), reference hyperparameters")
    plot_learning_curve(
        os.path.join(REPO, "runs/hopper_r3/progress.csv"),
        os.path.join(REPO, "results_hopper_r3.png"),
        "hopper (shaped alive cost), reference hyperparameters")
    plot_learning_curve(
        os.path.join(REPO, "runs/snake_r3/progress.csv"),
        os.path.join(REPO, "results_snake_r3.png"),
        "snake (T=200, in-tree XML), reference hyperparameters")
    plot_learning_curve(
        os.path.join(REPO, "runs/humanoid_r3/progress.csv"),
        os.path.join(REPO, "results_humanoid_r3.png"),
        "humanoid smoke (reduced policy-opt scale)")
    plot_seed_band(
        [(s, os.path.join(REPO, f"runs/swimmer_s{s}/progress.csv"))
         for s in (0, 1, 2)],
        "swimmer (T=200), reference hyperparameters, 3 seeds",
        os.path.join(REPO, "results_swimmer_seeds_r3.png"))
    plot_seed_band(
        [(0, os.path.join(REPO, "runs/snake_r4/progress.csv")),
         (1, os.path.join(REPO, "runs/snake_s1/progress.csv"))],
        "snake (reference physics), reference hyperparameters, 2 seeds",
        os.path.join(REPO, "results_snake_seeds_r5.png"))
    plot_seed_band(
        [(0, os.path.join(REPO, "runs/hopper_r3/progress.csv")),
         (1, os.path.join(REPO, "runs/hopper_s1/progress.csv"))],
        "hopper (shaped alive cost), reference hyperparameters, 2 seeds",
        os.path.join(REPO, "results_hopper_seeds_r5.png"))
    plot_sample_efficiency(os.path.join(REPO, "results_sample_efficiency.png"))
    plot_sample_efficiency_swimmer(
        os.path.join(REPO, "results_sample_efficiency_swimmer.png"))
    # legacy round-2 figure, reproducible from its committed CSV
    # (covers sweeps 1-32; the sweep-33..76 continuation's CSV was lost
    # to a machine reset — RESULTS.md documents the provenance)
    plot_learning_curve(
        os.path.join(REPO, "runs/cheetah_full_r2/progress.csv"),
        os.path.join(REPO, "results_cheetah_r2_committed.png"),
        "half-cheetah round 2, sweeps 1-32 (committed CSV)")


if __name__ == "__main__":
    main()
