"""PRNG-key discipline helpers."""

from __future__ import annotations

import jax
import numpy as np


class KeySequence:
    """Stateful convenience wrapper producing fresh subkeys on demand.

    Host-side only (the orchestrator's outer loops); jitted code receives
    explicit keys.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, (int, np.integer)):
            self._key = jax.random.PRNGKey(int(seed_or_key))
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def set_global_seeds(seed: int):
    """Seed numpy's legacy global RNG (host-side env resets, replay sampling).

    JAX randomness is keyed explicitly; this mirrors reference utils.py:34-37
    for the host-side numpy paths.
    """
    import random

    np.random.seed(seed)
    random.seed(seed)
