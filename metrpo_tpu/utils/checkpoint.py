"""Pytree checkpointing.

Replaces the reference's tf.train.Saver checkpoints
(``model_based_rl.py:495-538``): whole-training-state pytrees are written
per sweep for crash-restart, while the load-bearing early-stopping
"best weights" restore is NOT a filesystem round-trip here — it's a pure
``jnp.where`` select over stacked params (see dynamics_trainer / policy_opt).
Unlike the reference (which deletes the run dir on crash,
``training.py:403-411``), nothing here ever deletes data.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(tree), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic on POSIX


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(log_dir: str, prefix: str) -> str | None:
    """Find the highest-numbered '<prefix>-<N>.ckpt' in log_dir."""
    if not os.path.isdir(log_dir):
        return None
    best, best_n = None, -1
    for name in os.listdir(log_dir):
        if name.startswith(prefix) and name.endswith(".ckpt"):
            stem = name[len(prefix): -len(".ckpt")].strip("-")
            try:
                n = int(stem)
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(log_dir, name), n
    return best
