"""L-BFGS policy optimization on the differentiable rollout cost.

The reference wraps SciPy's Fortran L-BFGS-B around the unrolled graph via
``tf.contrib.opt.ScipyOptimizerInterface`` (``model_based_rl.py:391-398``)
and forces ``max_iters=1`` (one full minimize per sweep,
``run_model_based_rl.py:114-117``).  Here the whole optimization — L-BFGS
direction updates + zoom line searches on the scan-rollout cost — runs as
ONE jitted ``lax.while_loop`` program on device via optax.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from metrpo_tpu.config import PolicyOptParams
from metrpo_tpu.imagine import bptt_costs
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy


def make_lbfgs_optimize(policy: GaussianMLPPolicy,
                        ensemble: DynamicsEnsemble,
                        cost_fn: Callable,
                        is_done_fn,
                        cost_with_dones_fn,
                        pop: PolicyOptParams,
                        max_linesearch_steps: int = 20,
                        max_iters: int = 100,
                        tol: float = 1e-6):
    """Returns jitted optimize(policy_params, ens_params, input_stats,
    diff_stats, init_states) -> (params', final_cost, n_iters)."""

    opt = optax.lbfgs(
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps))

    def mean_cost(policy_params, ens_params, input_stats, diff_stats,
                  init_states):
        costs = bptt_costs(policy, ensemble, cost_fn, is_done_fn,
                           cost_with_dones_fn, policy_params, ens_params,
                           input_stats, diff_stats, init_states,
                           pop.T, pop.gamma, stochastic=0.0)
        return jnp.mean(costs)

    @jax.jit
    def optimize(policy_params, ens_params, input_stats, diff_stats,
                 init_states):
        fun = lambda p: mean_cost(p, ens_params, input_stats, diff_stats,
                                  init_states)
        value_and_grad = optax.value_and_grad_from_state(fun)

        def step(carry):
            params, state, _ = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=fun)
            params = optax.apply_updates(params, updates)
            return params, state, value

        def cond(carry):
            _, state, _ = carry
            count = optax.tree_utils.tree_get(state, "count")
            grad = optax.tree_utils.tree_get(state, "grad")
            gnorm = optax.tree_utils.tree_norm(grad)
            # the init state carries a zero grad — always take step 0
            return jnp.logical_and(count < max_iters,
                                   jnp.logical_or(count == 0, gnorm > tol))

        init_state = opt.init(policy_params)
        final_params, final_state, final_value = jax.lax.while_loop(
            cond, step, (policy_params, init_state, jnp.asarray(jnp.inf)))
        n_iters = optax.tree_utils.tree_get(final_state, "count")
        return final_params, final_value, n_iters

    return optimize
