"""BPTT policy optimization: Adam on the differentiable scan-rollout cost.

Replacement for the reference's graph-mode BPTT path
(``model_based_rl.py:186-206`` get_policy_optimizer + the unrolled
``build_policy_graph``): here the T-step rollout is a ``lax.scan`` and the
whole value-and-grad + Adam step is one jitted program.  Per-leaf gradient
norm clipping matches the reference's ``minimize_and_clip``
(``utils.py:262-276``, tf.clip_by_norm per variable).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from metrpo_tpu.config import PolicyOptParams
from metrpo_tpu.imagine import bptt_costs
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy


def clip_grads_per_leaf(grads, clip_val: Optional[float]):
    """tf.clip_by_norm per variable: scale each leaf to norm <= clip_val."""
    if clip_val is None:
        return grads

    def clip(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        return g * jnp.minimum(1.0, clip_val / jnp.maximum(norm, 1e-12))

    return jax.tree_util.tree_map(clip, grads)


class BpttStats(NamedTuple):
    training_cost: jnp.ndarray   # mean over ensemble members
    grad_norm: jnp.ndarray


def make_bptt_update(policy: GaussianMLPPolicy,
                     ensemble: DynamicsEnsemble,
                     cost_fn: Callable,
                     is_done_fn,
                     cost_with_dones_fn,
                     pop: PolicyOptParams,
                     stochastic: float = 0.0):
    """Returns (jitted update, opt-state init).

    update(policy_params, opt_state, ens_params, input_stats, diff_stats,
           init_states, key) -> (policy_params', opt_state', stats)
    """
    opt = optax.adam(pop.learning_rate)

    def init_opt_state(params):
        return opt.init(params)

    def mean_cost(policy_params, ens_params, input_stats, diff_stats,
                  init_states, key):
        costs = bptt_costs(policy, ensemble, cost_fn, is_done_fn,
                           cost_with_dones_fn, policy_params, ens_params,
                           input_stats, diff_stats, init_states,
                           pop.T, pop.gamma, stochastic=stochastic, key=key,
                           remat=pop.remat)
        # training objective = mean over ensemble members
        # (model_based_rl.py:365 training_policy_cost)
        return jnp.mean(costs)

    def update(policy_params, opt_state, ens_params, input_stats, diff_stats,
               init_states, key):
        cost, grads = jax.value_and_grad(mean_cost)(
            policy_params, ens_params, input_stats, diff_stats, init_states, key)
        grads = clip_grads_per_leaf(grads, pop.grad_norm_clipping)
        updates, opt_state = opt.update(grads, opt_state, policy_params)
        new_params = optax.apply_updates(policy_params, updates)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree_util.tree_leaves(grads)))
        return new_params, opt_state, BpttStats(cost, gnorm)

    return jax.jit(update), init_opt_state
