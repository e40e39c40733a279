"""Generalized Advantage Estimation over fixed-shape (B, T) batches.

Replaces the reference's per-path numpy GAE (``samplers/base.py:48-104``
using rllab ``special.discount_cumsum``) with a masked reverse
``lax.scan`` over the time axis — static shapes, fully jittable, runs on
device as part of the TRPO update program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discount_cumsum(x: jnp.ndarray, discount: float) -> jnp.ndarray:
    """y_t = sum_{l>=0} discount^l x_{t+l} along the LAST axis of (..., T)."""

    def step(carry, xt):
        carry = xt + discount * carry
        return carry, carry

    xT = jnp.moveaxis(x, -1, 0)  # (T, ...)
    _, out = jax.lax.scan(step, jnp.zeros(xT.shape[1:], x.dtype), xT, reverse=True)
    return jnp.moveaxis(out, 0, -1)


def gae_advantages(rewards: jnp.ndarray,    # (B, T)
                   values: jnp.ndarray,     # (B, T) baseline predictions
                   valids: jnp.ndarray,     # (B, T) 1.0 while alive
                   discount: float,
                   gae_lambda: float = 1.0):
    """Masked GAE. Invalid steps contribute zero delta, so advantages at
    valid steps match per-path discount_cumsum on the truncated paths
    (finite-horizon: v_{T} bootstrap = 0, as rllab appends 0).

    Returns (advantages, returns), both (B, T).
    """
    r = rewards * valids
    # v_{t+1} with 0 bootstrap at T; also zero beyond the valid region so
    # deltas after termination vanish.
    v = values * valids
    v_next = jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], axis=1)
    deltas = (r + discount * v_next - v) * valids
    advantages = discount_cumsum(deltas, discount * gae_lambda)
    returns = discount_cumsum(r, discount)
    return advantages * valids, returns * valids


def center_advantages(advantages: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """(adv - mean) / (std + 1e-8) over VALID entries (rllab util.center_advantages)."""
    n = jnp.maximum(jnp.sum(valids), 1.0)
    mean = jnp.sum(advantages * valids) / n
    var = jnp.sum(jnp.square(advantages - mean) * valids) / n
    return (advantages - mean) / (jnp.sqrt(var) + 1e-8) * valids
