"""TensorBoard-summary parity: weight/gradient/loss distribution sink.

Reference (SURVEY §5.1): summaries gated by the module constant
``TF_SUMMARY`` (``model_based_rl.py:21``) — per-layer weight/bias/
activation histograms (``training.py:104-114, 195-205``), per-variable
stats via ``variable_summaries`` (``utils.py:180-190``), gradient stats
inside ``minimize_and_clip`` (``utils.py:272-275``), per-ensemble loss
distributions (``model_based_rl.py:77-79, 146-148``), written by two
``tf.summary.FileWriter``s at ``tf_logs/{train,val}``
(``model_based_rl.py:339-340``).

TPU-native redesign: all per-leaf statistics (mean/std/min/max/L2 and a
fixed-bucket histogram) for an entire param pytree are computed in ONE
jitted program — a single device round-trip per dump instead of one
summary op per variable — and written to BOTH sinks:

* JSONL event records (one JSON object per line: ``{"step", "tag",
  "kind", ...}``) — directly loadable with pandas/jq;
* real TensorBoard ``events.out.tfevents.*`` files via
  ``utils/tbevents.py`` (hand-encoded Event protos + TFRecord framing,
  no TF/TB dependency), so ``tensorboard --logdir tf_logs`` works
  exactly as it did on the reference's FileWriter output.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

HIST_BINS = 20


@jax.jit
def _tree_stats(tree):
    """Per-leaf stats for a whole pytree in one compiled program."""

    def leaf_stats(x):
        x = jnp.asarray(x, jnp.float32).ravel()
        counts, edges = jnp.histogram(x, bins=HIST_BINS)
        return {
            "mean": jnp.mean(x),
            "std": jnp.std(x),
            "min": jnp.min(x),
            "max": jnp.max(x),
            "l2": jnp.sqrt(jnp.sum(x * x)),
            "hist_counts": counts,
            "hist_edges": edges,
        }

    return jax.tree_util.tree_map(leaf_stats, tree)


def _leaf_paths(tree) -> list[str]:
    paths_and_leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, _leaf in paths_and_leaves:
        out.append("/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path))
    return out


class SummaryWriter:
    """JSONL event writer — the FileWriter analog."""

    def __init__(self, logdir: str):
        from metrpo_tpu.utils.tbevents import TBEventWriter
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "events.jsonl"), "a")
        self._tb = TBEventWriter(logdir)

    def _write(self, record: dict):
        self._f.write(json.dumps(record) + "\n")

    def scalar(self, tag: str, value: Any, step: int):
        self._write({"step": int(step), "tag": tag, "kind": "scalar",
                     "value": float(value)})
        self._tb.scalar(tag, float(value), step)

    def histogram(self, tag: str, values, step: int):
        """Histogram of a host array (e.g. ensemble loss distribution,
        model_based_rl.py:77-79)."""
        values = np.asarray(values, np.float64).ravel()
        counts, edges = np.histogram(values, bins=min(HIST_BINS, max(len(values), 1)))
        self._write({
            "step": int(step), "tag": tag, "kind": "histogram",
            "mean": float(values.mean()), "std": float(values.std()),
            "min": float(values.min()), "max": float(values.max()),
            "hist_counts": counts.tolist(), "hist_edges": edges.tolist(),
        })
        self._tb.histogram(tag, values, step, counts=counts, edges=edges)

    def tree(self, prefix: str, tree, step: int):
        """variable_summaries over a whole param/grad pytree
        (utils.py:180-190; one jitted program for all leaves)."""
        stats = jax.device_get(_tree_stats(tree))
        flat_stats, _ = jax.tree_util.tree_flatten_with_path(
            stats, is_leaf=lambda x: isinstance(x, dict) and "hist_counts" in x)
        for path, st in flat_stats:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            self._write({
                "step": int(step), "tag": f"{prefix}/{name}",
                "kind": "histogram",
                "mean": float(st["mean"]), "std": float(st["std"]),
                "min": float(st["min"]), "max": float(st["max"]),
                "l2": float(st["l2"]),
                "hist_counts": np.asarray(st["hist_counts"]).tolist(),
                "hist_edges": np.asarray(st["hist_edges"]).tolist(),
            })
            # TB histogram rebuilt from the jitted bucket stats (the raw
            # leaf stays on device; only summaries cross the host boundary)
            self._tb_tree_hist(f"{prefix}/{name}", st, step)

    def _tb_tree_hist(self, tag: str, st: dict, step: int):
        counts = np.asarray(st["hist_counts"], np.float64)
        edges = np.asarray(st["hist_edges"], np.float64)
        # approximate per-bucket midpoints as representative values so
        # min/max/sum in the proto stay consistent with the real stats
        self._tb._record_histogram_from_stats(
            tag, step,
            vmin=float(st["min"]), vmax=float(st["max"]),
            num=float(counts.sum()),
            mean=float(st["mean"]), std=float(st["std"]),
            counts=counts, edges=edges)

    def flush(self):
        self._f.flush()
        self._tb.flush()

    def close(self):
        self._f.close()
        self._tb.close()

    # context manager support
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_writers(snapshot_dir: Optional[str]):
    """The reference's two FileWriters (model_based_rl.py:339-340):
    tf_logs/train and tf_logs/val. Returns (train, val) or (None, None)."""
    if not snapshot_dir:
        return None, None
    base = os.path.join(snapshot_dir, "tf_logs")
    return SummaryWriter(os.path.join(base, "train")), \
        SummaryWriter(os.path.join(base, "val"))


def read_events(logdir: str) -> list[dict]:
    """Load all records back (the pandas-free reader used by tests)."""
    path = os.path.join(logdir, "events.jsonl")
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
