"""TRPO as a single jitted program.

In-tree, functional replacement for the reference's NPO/TRPO stack
(``algos/npo.py:33-121``, ``algos/trpo.py:7-21`` + rllab's external
ConjugateGradientOptimizer): surrogate loss ``-E[ratio * adv]`` under a
mean-KL trust region, natural gradient via CG on Fisher-vector products
(JVP-of-grad of the KL), backtracking line search — all one
``jax.jit``-compiled update over the batched imagined trajectories.
No per-path Python, no feed dicts; GAE + baseline fit are inside the
program too.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from metrpo_tpu.algos.baselines import LinearFeatureBaseline
from metrpo_tpu.config import TrpoParams
from metrpo_tpu.imagine import ImaginedBatch
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.cg import conjugate_gradient
from metrpo_tpu.ops.distributions import gaussian_kl, gaussian_logpdf
from metrpo_tpu.ops.gae import center_advantages, discount_cumsum, gae_advantages
from metrpo_tpu.utils.tree import tree_flatten_vector, tree_unflatten_vector


class TrpoStats(NamedTuple):
    surrogate_before: jnp.ndarray
    surrogate_after: jnp.ndarray
    kl: jnp.ndarray
    step_accepted: jnp.ndarray
    backtracks: jnp.ndarray
    mean_return: jnp.ndarray
    entropy: jnp.ndarray


def _prepare(batch: ImaginedBatch, discount: float, gae_lambda: float,
             baseline: LinearFeatureBaseline):
    """GAE + advantage centering on the fixed-shape batch."""
    returns = discount_cumsum(batch.rewards * batch.valids, discount)
    values = baseline.fit_and_predict(batch.observations, returns, batch.valids)
    adv, _ = gae_advantages(batch.rewards, values, batch.valids, discount, gae_lambda)
    adv = center_advantages(adv, batch.valids)
    return adv, returns


def make_trpo_update(policy: GaussianMLPPolicy, cfg: TrpoParams,
                     baseline: LinearFeatureBaseline | None = None,
                     jit: bool = True):
    """Build the TRPO update: (params, ImaginedBatch) -> (params', stats).

    ``jit=False`` returns the raw traceable function so callers can embed
    it inside a larger jitted program (e.g. the chunked rollout+update
    scan in policy_opt.py)."""
    if baseline is None:
        baseline = LinearFeatureBaseline()

    def update(params: dict, batch: ImaginedBatch):
        adv, returns = _prepare(batch, cfg.discount, cfg.gae_lambda, baseline)
        obs, acts, valids = batch.observations, batch.actions, batch.valids
        old_mean, old_logstd = batch.means, batch.logstds
        n_valid = jnp.maximum(jnp.sum(valids), 1.0)
        old_logp = gaussian_logpdf(acts, old_mean, old_logstd)

        def surrogate(p):
            mean, logstd = policy.dist(p, obs)
            logp = gaussian_logpdf(acts, mean, logstd)
            ratio = jnp.exp(logp - old_logp)
            return -jnp.sum(ratio * adv * valids) / n_valid

        def mean_kl(p):
            mean, logstd = policy.dist(p, obs)
            kl = gaussian_kl(old_mean, old_logstd, mean, logstd)
            return jnp.sum(kl * valids) / n_valid

        loss_before = surrogate(params)
        g_tree = jax.grad(surrogate)(params)
        g = tree_flatten_vector(g_tree)

        kl_grad = jax.grad(mean_kl)

        def fvp(v_flat):
            v_tree = tree_unflatten_vector(v_flat, params)
            _, hvp_tree = jax.jvp(kl_grad, (params,), (v_tree,))
            return tree_flatten_vector(hvp_tree) + cfg.reg_coeff * v_flat

        step_dir = conjugate_gradient(fvp, g, iters=cfg.cg_iters)
        shs = jnp.dot(step_dir, fvp(step_dir))
        # beta = sqrt(2 * delta / s^T H s)
        beta = jnp.sqrt(2.0 * cfg.step_size / jnp.maximum(shs, 1e-12))
        full_step = beta * step_dir

        params_flat = tree_flatten_vector(params)

        def try_step(scale):
            new_flat = params_flat - scale * full_step
            new_params = tree_unflatten_vector(new_flat, params)
            return new_params, surrogate(new_params), mean_kl(new_params)

        # Backtracking line search: first scale with loss improvement AND
        # KL within the trust region wins; if none, keep old params
        # (rllab ConjugateGradientOptimizer semantics).
        def cond(state):
            i, accepted, *_ = state
            return jnp.logical_and(i < cfg.max_backtracks,
                                   jnp.logical_not(accepted))

        def body(state):
            i, _, _, _, _ = state
            scale = cfg.backtrack_ratio ** i
            new_params, loss, kl = try_step(scale)
            ok = jnp.logical_and(loss < loss_before, kl <= cfg.step_size)
            return (i + 1, ok, new_params, loss, kl)

        init = (jnp.asarray(0), jnp.asarray(False), params, loss_before,
                jnp.asarray(0.0))
        n_tries, accepted, cand_params, cand_loss, cand_kl = \
            jax.lax.while_loop(cond, body, init)

        new_params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accepted, a, b), cand_params, params)

        mean, logstd = policy.dist(new_params, obs)
        ent = jnp.sum(jnp.sum(logstd * valids[..., None], axis=-1)) / n_valid + \
            0.5 * policy.n_actions * (jnp.log(2 * jnp.pi) + 1.0)
        stats = TrpoStats(
            surrogate_before=loss_before,
            surrogate_after=jnp.where(accepted, cand_loss, loss_before),
            kl=jnp.where(accepted, cand_kl, 0.0),
            step_accepted=accepted,
            backtracks=n_tries,
            mean_return=jnp.sum(batch.rewards * valids) / jnp.maximum(
                jnp.sum(valids[:, :1]) , 1.0),
            entropy=ent,
        )
        return new_params, stats

    return jax.jit(update) if jit else update
