"""Gaussian MLP policy with state-independent log-std.

Functional re-design of rllab's GaussianMLPPolicy as wrapped by the
reference (``training.py:74-118``): a mean MLP (tanh hidden, configurable
output nonlinearity) plus a logstd parameter vector.  The reference builds
a second weight-sharing graph ``policy_model`` so imagined rollouts backprop
into the same variables TRPO updates (``training.py:96-117``); here that is
automatic — there is only one param pytree.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.config import PolicyModelParams, resolve_activation
from metrpo_tpu.models.mlp import mlp_apply, mlp_init
from metrpo_tpu.ops.distributions import gaussian_logpdf


class GaussianMLPPolicy(NamedTuple):
    """Static policy definition (params live in a separate pytree)."""

    n_obs: int
    n_actions: int
    hidden_layers: tuple
    hidden_act: Callable
    output_act: Callable
    action_low: jnp.ndarray
    action_high: jnp.ndarray

    @staticmethod
    def create(n_obs: int, n_actions: int, cfg: PolicyModelParams,
               action_low=None, action_high=None) -> "GaussianMLPPolicy":
        low = jnp.asarray(action_low if action_low is not None else -np.ones(n_actions),
                          jnp.float32)
        high = jnp.asarray(action_high if action_high is not None else np.ones(n_actions),
                           jnp.float32)
        return GaussianMLPPolicy(
            n_obs=n_obs,
            n_actions=n_actions,
            hidden_layers=tuple(cfg.hidden_layers),
            hidden_act=resolve_activation(cfg.hidden_nonlinearity),
            output_act=resolve_activation(cfg.output_nonlinearity),
            action_low=low,
            action_high=high,
        )

    def init(self, key, init_std: float = 1.0) -> dict:
        sizes = [self.n_obs, *self.hidden_layers, self.n_actions]
        net = mlp_init(key, sizes)
        net["logstd"] = jnp.full((self.n_actions,), jnp.log(init_std), jnp.float32)
        return net

    # -- forward -----------------------------------------------------------

    def mean(self, params: dict, obs: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(params, obs, self.hidden_act, self.output_act)

    def act(self, params: dict, obs: jnp.ndarray, key=None,
            stochastic: float | jnp.ndarray = 0.0, clip: bool = True) -> jnp.ndarray:
        """Mean action + stochastic * N(0,1) * exp(logstd), optionally clipped
        (reference training.py:115-116 + action clip at model_based_rl.py:128)."""
        mu = self.mean(params, obs)
        if key is not None:
            noise = jax.random.normal(key, mu.shape) * jnp.exp(params["logstd"])
            mu = mu + stochastic * noise
        if clip:
            mu = jnp.clip(mu, self.action_low, self.action_high)
        return mu

    # rllab GaussianMLPPolicy min_std: the std never collapses below this
    # no matter how many natural-gradient steps shrink it.
    MIN_LOGSTD = -13.8  # log(1e-6)

    def dist(self, params: dict, obs: jnp.ndarray):
        """(mean, logstd broadcast to batch) — the policy distribution info."""
        mu = self.mean(params, obs)
        logstd = jnp.broadcast_to(
            jnp.maximum(params["logstd"], self.MIN_LOGSTD), mu.shape)
        return mu, logstd

    def log_prob(self, params: dict, obs: jnp.ndarray, actions: jnp.ndarray):
        mu, logstd = self.dist(params, obs)
        return gaussian_logpdf(actions, mu, logstd)

    def reset_logstd(self, params: dict, init_std: float) -> dict:
        """Reset exploration std each sweep (reference training.py:368-370,
        model_based_rl.py:1119-1121)."""
        out = dict(params)
        out["logstd"] = jnp.full_like(params["logstd"], jnp.log(init_std))
        return out
