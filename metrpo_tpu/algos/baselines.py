"""Value baselines.

``LinearFeatureBaseline`` is the in-tree equivalent of rllab's
LinearFeatureBaseline (imported by the reference at ``training.py:338-340``):
ridge regression on hand-crafted features
[obs, obs^2, t/100, (t/100)^2, (t/100)^3, 1], fit after each sampling round.
Implemented in jnp over fixed-shape (B, T) batches with validity masking so
fit + predict jit into the policy-update program.
"""

from __future__ import annotations

import jax.numpy as jnp


def _features(obs: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """obs: (B, T, S) -> (B, T, F) with F = 2S + 4."""
    B, T, S = obs.shape
    o = jnp.clip(obs, -10.0, 10.0)  # rllab clips obs in features
    t = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None] / 100.0,
                         (B, T, 1))
    ones = jnp.ones((B, T, 1))
    return jnp.concatenate([o, jnp.square(o), t, jnp.square(t), t ** 3, ones],
                           axis=-1) * valids[..., None]


class LinearFeatureBaseline:
    def __init__(self, reg_coeff: float = 1e-5):
        self.reg_coeff = reg_coeff

    def fit_and_predict(self, obs: jnp.ndarray, returns: jnp.ndarray,
                        valids: jnp.ndarray) -> jnp.ndarray:
        """Fit on this batch and return predictions (B, T).

        rllab fits on the PREVIOUS iteration's paths then predicts on the
        new ones; ME-TRPO calls fit after process_samples
        (samplers/base.py:163-167) so at steady state the distinction is a
        one-iteration lag. Fitting on the current batch is the standard
        modern variant and strictly lower-variance.
        """
        feats = _features(obs, valids)           # (B, T, F)
        F = feats.shape[-1]
        X = feats.reshape(-1, F)
        y = (returns * valids).reshape(-1)
        reg = self.reg_coeff * jnp.eye(F)
        # normal equations with ridge; masked rows are all-zero and inert
        XtX = X.T @ X + reg
        Xty = X.T @ y
        coeffs = jnp.linalg.solve(XtX, Xty)
        return (X @ coeffs).reshape(returns.shape) * valids


class ZeroBaseline:
    def fit_and_predict(self, obs, returns, valids):
        return jnp.zeros_like(returns)
