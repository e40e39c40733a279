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
BLUE, ORANGE = "#2a78d6", "#eb6834"
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


def main():
    plot_learning_curve(
        os.path.join(REPO, "runs/cheetah_ref/progress.csv"),
        os.path.join(REPO, "results_cheetah_r2.png"),
        "half-cheetah, unmodified reference hyperparameters, one TPU v5e chip")
    plot_learning_curve(
        os.path.join(REPO, "runs/swimmer_ref/progress.csv"),
        os.path.join(REPO, "results_swimmer_r2.png"),
        "swimmer (T=200), reference hyperparameters, one TPU v5e chip")
    plot_learning_curve(
        os.path.join(REPO, "runs/ant_ref/progress.csv"),
        os.path.join(REPO, "results_ant_r2.png"),
        "ant (analytic is_done masking), reference hyperparameters")
    plot_sample_efficiency(os.path.join(REPO, "results_sample_efficiency.png"))


if __name__ == "__main__":
    main()
