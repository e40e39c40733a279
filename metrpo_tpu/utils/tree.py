"""Pytree flatten/unflatten helpers (reference utils.py:192-204 analog)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tree_flatten_vector(tree: Any) -> jnp.ndarray:
    """Concatenate all leaves into one flat vector."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l) for l in leaves]) if leaves else jnp.zeros((0,))


def tree_unflatten_vector(flat: jnp.ndarray, tree_like: Any) -> Any:
    """Inverse of tree_flatten_vector given a reference pytree structure."""
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    out, idx = [], 0
    for l in leaves:
        size = int(np.prod(l.shape)) if l.shape else 1
        out.append(jnp.reshape(flat[idx: idx + size], l.shape))
        idx += size
    return jax.tree_util.tree_unflatten(treedef, out)


def tree_size(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) if l.shape else 1
               for l in jax.tree_util.tree_leaves(tree))


def tree_add(a: Any, b: Any) -> Any:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_scale(a: Any, s) -> Any:
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_select(pred, a: Any, b: Any) -> Any:
    """Elementwise-broadcast where(pred, a, b) over matching pytrees.

    ``pred`` may be a scalar bool or a vector broadcast against a leading
    axis (used for per-ensemble-member best-weight selection — the
    functional replacement for the reference's per-model checkpoint
    save/restore at model_based_rl.py:993-1008, 871-878).
    """
    def sel(x, y):
        p = pred
        extra = x.ndim - jnp.ndim(p)
        if extra > 0:
            p = jnp.reshape(p, jnp.shape(p) + (1,) * extra)
        return jnp.where(p, x, y)

    return jax.tree_util.tree_map(sel, a, b)
