"""Diagonal-Gaussian distribution ops (log-prob, KL, entropy, ratio).

Matches rllab's DiagonalGaussian semantics used by the reference's
NPO/TRPO surrogate + KL graph (``algos/npo.py:67-91``).
"""

from __future__ import annotations

import jax.numpy as jnp

LOG_2PI = jnp.log(2.0 * jnp.pi)


def gaussian_logpdf(x, mean, logstd):
    """Sum over the action dimension: (B,A) -> (B,)."""
    z = (x - mean) / jnp.exp(logstd)
    return -0.5 * jnp.sum(jnp.square(z), axis=-1) \
        - jnp.sum(logstd, axis=-1) - 0.5 * x.shape[-1] * LOG_2PI


def gaussian_kl(mean_old, logstd_old, mean_new, logstd_new):
    """KL(old || new), summed over action dim: (B,A) -> (B,)."""
    var_old = jnp.exp(2.0 * logstd_old)
    var_new = jnp.exp(2.0 * logstd_new)
    num = jnp.square(mean_old - mean_new) + var_old - var_new
    return jnp.sum(
        logstd_new - logstd_old + num / (2.0 * var_new + 1e-8), axis=-1
    )


def gaussian_entropy(logstd):
    """Per-sample entropy, summed over action dim."""
    return jnp.sum(logstd + 0.5 * (LOG_2PI + 1.0), axis=-1)


def likelihood_ratio(x, mean_old, logstd_old, mean_new, logstd_new):
    return jnp.exp(
        gaussian_logpdf(x, mean_new, logstd_new)
        - gaussian_logpdf(x, mean_old, logstd_old)
    )
