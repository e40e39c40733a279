"""Vanilla policy gradient (REINFORCE with baseline), jitted.

In-tree replacement for the reference's VPG (``algos/vpg.py:13-136``, which
leaned on rllab's FirstOrderOptimizer): surrogate ``-E[log pi * adv]``
optimized with one Adam step per iteration over the full imagined batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from metrpo_tpu.algos.baselines import LinearFeatureBaseline
from metrpo_tpu.algos.trpo import _prepare
from metrpo_tpu.config import VpgParams
from metrpo_tpu.imagine import ImaginedBatch
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.distributions import gaussian_kl, gaussian_logpdf


class VpgStats(NamedTuple):
    loss: jnp.ndarray
    mean_kl: jnp.ndarray
    mean_return: jnp.ndarray


def make_vpg_update(policy: GaussianMLPPolicy, cfg: VpgParams,
                    baseline: LinearFeatureBaseline | None = None,
                    jit: bool = True):
    if baseline is None:
        baseline = LinearFeatureBaseline()
    opt = optax.adam(cfg.learning_rate)

    def init_opt_state(params):
        return opt.init(params)

    def update(params: dict, opt_state, batch: ImaginedBatch):
        adv, _ = _prepare(batch, cfg.discount, cfg.gae_lambda, baseline)
        obs, acts, valids = batch.observations, batch.actions, batch.valids
        n_valid = jnp.maximum(jnp.sum(valids), 1.0)

        def surrogate(p):
            mean, logstd = policy.dist(p, obs)
            logp = gaussian_logpdf(acts, mean, logstd)
            return -jnp.sum(logp * adv * valids) / n_valid

        loss, grads = jax.value_and_grad(surrogate)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        mean_new, logstd_new = policy.dist(new_params, obs)
        kl = gaussian_kl(batch.means, batch.logstds, mean_new, logstd_new)
        stats = VpgStats(
            loss=loss,
            mean_kl=jnp.sum(kl * valids) / n_valid,
            mean_return=jnp.sum(batch.rewards * valids) /
            jnp.maximum(jnp.sum(valids[:, :1]), 1.0),
        )
        return new_params, opt_state, stats

    return (jax.jit(update) if jit else update), init_opt_state
