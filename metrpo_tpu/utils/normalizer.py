"""Streaming mean/std normalizer as a pure pytree.

Functional re-design of the reference's TF-variable ``RunningMeanStd``
(reference ``running_mean_std.py:3-42``): state is (sum, sumsq, count),
std is floored at sqrt(1e-2) exactly like the reference, and updates are
pure functions so the stats ride inside jitted programs and checkpoints
as ordinary pytree leaves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningStats(NamedTuple):
    sum: jnp.ndarray    # (D,)
    sumsq: jnp.ndarray  # (D,)
    count: jnp.ndarray  # ()

    @property
    def mean(self) -> jnp.ndarray:
        # Guard count=0 (reference leaves mean undefined until first update;
        # stats are never *used* before then, so the guard only avoids NaNs).
        return self.sum / jnp.maximum(self.count, 1e-8)

    @property
    def std(self) -> jnp.ndarray:
        c = jnp.maximum(self.count, 1e-8)
        var = self.sumsq / c - jnp.square(self.mean)
        # Variance floor 1e-2 => std floor 0.1 (reference running_mean_std.py:23-27).
        return jnp.sqrt(jnp.maximum(var, 1e-2))


def running_stats_init(dim: int, epsilon: float = 0.0, dtype=jnp.float32) -> RunningStats:
    return RunningStats(
        sum=jnp.zeros((dim,), dtype),
        sumsq=jnp.full((dim,), epsilon, dtype),
        count=jnp.asarray(epsilon, dtype),
    )


def running_stats_update(stats: RunningStats, x: jnp.ndarray) -> RunningStats:
    """Fold a batch (N, D) into the stats. Pure: returns new stats."""
    x = jnp.asarray(x)
    return RunningStats(
        sum=stats.sum + jnp.sum(x, axis=0),
        sumsq=stats.sumsq + jnp.sum(jnp.square(x), axis=0),
        count=stats.count + x.shape[0],
    )


def normalize(stats: RunningStats, x: jnp.ndarray) -> jnp.ndarray:
    return (x - stats.mean) / stats.std


def denormalize(stats: RunningStats, x: jnp.ndarray) -> jnp.ndarray:
    return x * stats.std + stats.mean
