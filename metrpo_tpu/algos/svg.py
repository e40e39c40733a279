"""SVG(1)-style gradient engine.

The reference computes stochastic-value-gradients by a MANUAL backward
recursion over recorded rollouts, chaining per-step numpy Jacobians of
cost/policy/model (``svg_utils.py:27-66``), because TF 1.4 graph-mode made
direct differentiation through a model rollout awkward.  In JAX the
production path is simply ``jax.grad`` through the ``lax.scan`` rollout —
``make_svg_update`` below.  The manual recursion is kept as a TEST ORACLE
(``manual_svg_gradient``), mirroring the reference's own consistency check
``test_svg_gradient`` (``svg_utils.py:147-209``): on a simulated
trajectory both must agree exactly.

Cost convention: the reference's SVG uses the *current-state* cost hack
``cost_tf(None, a, s)`` (``svg_utils.py:123-125``) — cost evaluated with
x_next = current state.  All reference envs' costs read only (u, x_next),
so this is well-defined; we expose it as ``cost_sa(s, a) = cost(s, a, s)``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.normalizer import RunningStats
from metrpo_tpu.utils.tree import (tree_flatten_vector, tree_size,
                                   tree_unflatten_vector)


def make_cost_sa(cost_fn: Callable) -> Callable:
    """cost(s, a) with x_next := s (the reference's current-state hack)."""
    def cost_sa(s, a):
        return jnp.sum(cost_fn(s[None], a[None], s[None]))
    return cost_sa


def svg_objective(policy: GaussianMLPPolicy,
                  ensemble: DynamicsEnsemble,
                  cost_fn: Callable,
                  policy_params: dict,
                  member_params: dict,
                  input_stats: RunningStats,
                  diff_stats: RunningStats,
                  init_states: jnp.ndarray,   # (B, S)
                  T: int,
                  gamma: float = 1.0) -> jnp.ndarray:
    """J(theta) = mean over batch of sum_t gamma^t c(s_t, a_t) following
    the learned model from the given initial states (no action clipping —
    the reference's SVG graph differentiates the raw policy output,
    svg_utils.py:127-130)."""

    def rollout_cost(s0):
        def step(carry, t):
            s, acc = carry
            a = policy.mean(policy_params, s[None])[0]
            c = jnp.sum(cost_fn(s[None], a[None], s[None]))
            s_next = ensemble.apply_member(
                member_params, jnp.concatenate([s, a])[None],
                input_stats, diff_stats)[0]
            return (s_next, acc + (gamma ** t) * c), None

        (s, acc), _ = jax.lax.scan(
            step, (s0, 0.0), jnp.arange(T, dtype=jnp.float32))
        return acc

    return jnp.mean(jax.vmap(rollout_cost)(init_states))


def make_svg_update(policy: GaussianMLPPolicy,
                    ensemble: DynamicsEnsemble,
                    cost_fn: Callable,
                    learning_rate: float,
                    T: int,
                    gamma: float = 1.0):
    """Jitted theta <- theta - lr * dJ/dtheta (reference svg_update,
    svg_utils.py:12-25 — plain gradient descent, no Adam)."""

    @jax.jit
    def update(policy_params, member_params, input_stats, diff_stats,
               init_states):
        val, grads = jax.value_and_grad(svg_objective, argnums=3)(
            policy, ensemble, cost_fn, policy_params, member_params,
            input_stats, diff_stats, init_states, T, gamma)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - learning_rate * g, policy_params, grads)
        return new_params, val, grads

    return update


# ---------------------------------------------------------------------------
# Manual backward recursion (test oracle — the reference's actual algorithm)
# ---------------------------------------------------------------------------


def manual_svg_gradient(policy: GaussianMLPPolicy,
                        ensemble: DynamicsEnsemble,
                        cost_fn: Callable,
                        policy_params: dict,
                        member_params: dict,
                        input_stats: RunningStats,
                        diff_stats: RunningStats,
                        rollouts: list,
                        gamma: float = 1.0) -> np.ndarray:
    """Direct port of the recursion at svg_utils.py:27-66.

    rollouts: list of trajectories, each a list of (s, a, s_next) triplets.
    Returns the flat policy gradient averaged over trajectories.
    """
    cost_sa = make_cost_sa(cost_fn)

    def policy_fn(p, s):
        return policy.mean(p, s[None])[0]

    def model_fn(s, a):
        return ensemble.apply_member(
            member_params, jnp.concatenate([s, a])[None],
            input_stats, diff_stats)[0]

    # per-step Jacobian functions (jitted once, reused per step)
    d_cost = jax.jit(jax.grad(lambda s, a: cost_sa(s, a), argnums=(0, 1)))
    d_policy_s = jax.jit(jax.jacrev(lambda s: policy_fn(policy_params, s)))
    d_policy_theta = jax.jit(jax.jacrev(
        lambda p, s: policy_fn(p, s), argnums=0))
    d_model = jax.jit(jax.jacrev(model_fn, argnums=(0, 1)))

    n_theta = tree_size(policy_params)
    avg_theta = np.zeros((n_theta,))
    for rollout in rollouts:
        g_theta = np.zeros((n_theta,))
        g_state = None
        for (s, a, s_next) in reversed(rollout):
            s = jnp.asarray(s, jnp.float32)
            a = jnp.asarray(a, jnp.float32)
            if g_state is None:
                g_state = np.zeros((s.shape[0],))
            c_s, c_a = d_cost(s, a)
            pi_s = d_policy_s(s)                       # (A, S)
            pi_th_tree = d_policy_theta(policy_params, s)  # pytree of (A, ...)
            # flatten: (A, n_theta)
            pi_th = np.stack([
                np.asarray(tree_flatten_vector(
                    jax.tree_util.tree_map(lambda l: l[i], pi_th_tree)))
                for i in range(policy.n_actions)])
            f_s, f_a = d_model(s, a)                   # (S, S), (S, A)

            c_s, c_a = np.asarray(c_s), np.asarray(c_a)
            pi_s, f_s, f_a = np.asarray(pi_s), np.asarray(f_s), np.asarray(f_a)

            g_theta = c_a @ pi_th + gamma * (g_state @ f_a @ pi_th + g_theta)
            g_state = c_s + c_a @ pi_s + gamma * g_state @ (f_s + f_a @ pi_s)
        avg_theta += g_theta
    return avg_theta / len(rollouts)
