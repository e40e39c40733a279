"""PPO: clipped surrogate + optional adaptive KL penalty, jitted.

The reference ships a PPO (``algos/ppo.py:12-193``) that is unreachable
from the main path and would crash if instantiated (undefined
``AdamOptimizer``/``OrderedDict`` — SURVEY.md 2.15).  This is the working
in-tree equivalent: L_clip = E[min(r A, clip(r, 1-eps, 1+eps) A)], with an
optional KL penalty whose coefficient adapts x2 / /2 around a target KL
(the reference's penalty up/down assign ops at ``:133-153``), several Adam
epochs per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from metrpo_tpu.algos.baselines import LinearFeatureBaseline
from metrpo_tpu.algos.trpo import _prepare
from metrpo_tpu.imagine import ImaginedBatch
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.distributions import gaussian_kl, gaussian_logpdf


class PpoConfig(NamedTuple):
    learning_rate: float = 3e-4
    clip_eps: float = 0.2
    n_epochs: int = 10
    discount: float = 1.0
    gae_lambda: float = 1.0
    use_kl_penalty: bool = False
    kl_target: float = 0.01
    kl_coeff_init: float = 1.0


class PpoState(NamedTuple):
    opt_state: optax.OptState
    kl_coeff: jnp.ndarray


class PpoStats(NamedTuple):
    loss: jnp.ndarray
    mean_kl: jnp.ndarray
    clip_fraction: jnp.ndarray
    kl_coeff: jnp.ndarray
    mean_return: jnp.ndarray


def make_ppo_update(policy: GaussianMLPPolicy, cfg: PpoConfig = PpoConfig(),
                    baseline: LinearFeatureBaseline | None = None):
    if baseline is None:
        baseline = LinearFeatureBaseline()
    opt = optax.adam(cfg.learning_rate)

    def init_state(params) -> PpoState:
        return PpoState(opt.init(params), jnp.asarray(cfg.kl_coeff_init))

    @jax.jit
    def update(params: dict, state: PpoState, batch: ImaginedBatch):
        adv, _ = _prepare(batch, cfg.discount, cfg.gae_lambda, baseline)
        obs, acts, valids = batch.observations, batch.actions, batch.valids
        old_mean, old_logstd = batch.means, batch.logstds
        old_logp = gaussian_logpdf(acts, old_mean, old_logstd)
        n_valid = jnp.maximum(jnp.sum(valids), 1.0)

        def loss_fn(p, kl_coeff):
            mean, logstd = policy.dist(p, obs)
            logp = gaussian_logpdf(acts, mean, logstd)
            ratio = jnp.exp(logp - old_logp)
            clipped = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps)
            surr = jnp.minimum(ratio * adv, clipped * adv)
            loss = -jnp.sum(surr * valids) / n_valid
            kl = jnp.sum(gaussian_kl(old_mean, old_logstd, mean, logstd)
                         * valids) / n_valid
            if cfg.use_kl_penalty:
                loss = loss + kl_coeff * kl
            clip_frac = jnp.sum((jnp.abs(ratio - 1.0) > cfg.clip_eps)
                                * valids) / n_valid
            return loss, (kl, clip_frac)

        def epoch(carry, _):
            params, opt_state = carry
            (loss, (kl, cf)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state.kl_coeff)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, kl, cf)

        (params, opt_state), (losses, kls, cfs) = jax.lax.scan(
            epoch, (params, state.opt_state), None, length=cfg.n_epochs)

        final_kl = kls[-1]
        # adaptive penalty: x2 above 2*target, /2 below target/2
        kl_coeff = jnp.where(final_kl > 2.0 * cfg.kl_target,
                             state.kl_coeff * 2.0,
                             jnp.where(final_kl < cfg.kl_target / 2.0,
                                       state.kl_coeff * 0.5, state.kl_coeff))
        stats = PpoStats(
            loss=losses[-1], mean_kl=final_kl, clip_fraction=cfs[-1],
            kl_coeff=kl_coeff,
            mean_return=jnp.sum(batch.rewards * valids) /
            jnp.maximum(jnp.sum(valids[:, :1]), 1.0))
        return params, PpoState(opt_state, kl_coeff), stats

    return update, init_state
