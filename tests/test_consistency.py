"""Cross-implementation consistency oracles (reference test strategy §4):

  - scan-graph trajectory cost == step-by-step numpy rollout cost
    (port of test_policy_cost, env_helpers.py:271-305);
  - manual SVG backward recursion == autodiff through the scan
    (port of test_svg_gradient, svg_utils.py:147-209);
  - masked GAE == per-path numpy discount_cumsum.
"""

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.algos.svg import manual_svg_gradient, svg_objective
from metrpo_tpu.config import DynamicsModelParams, PolicyModelParams
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.imagine import bptt_costs
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.gae import discount_cumsum, gae_advantages
from metrpo_tpu.utils.normalizer import running_stats_init, running_stats_update
from metrpo_tpu.utils.tree import tree_flatten_vector


def _setup(K=3, S=2, A=2):
    env = Point2DEnv()
    policy = GaussianMLPPolicy.create(S, A, PolicyModelParams(hidden_layers=(8, 8)))
    ens = DynamicsEnsemble.create(S, A, 0, DynamicsModelParams(
        hidden_layers=(16, 16), nonlinearity=("relu", "relu")), K)
    pp = policy.init(jax.random.PRNGKey(0))
    ep = ens.init(jax.random.PRNGKey(1))
    in_stats = running_stats_update(running_stats_init(S + A),
                                    np.random.randn(100, S + A))
    diff_stats = running_stats_update(running_stats_init(S),
                                      0.1 * np.random.randn(100, S))
    return env, policy, ens, pp, ep, in_stats, diff_stats


def test_scan_cost_matches_numpy_rollout():
    """The jitted scan rollout cost must equal a step-by-step host rollout
    through the same policy/model/cost (the reference's policy-cost graph
    vs numpy check)."""
    env, policy, ens, pp, ep, in_stats, diff_stats = _setup()
    T, B = 7, 5
    inits = np.random.randn(B, 2).astype(np.float32)
    gamma = 0.97

    costs = np.asarray(bptt_costs(
        policy, ens, env.cost, None, None, pp, ep, in_stats, diff_stats,
        jnp.asarray(inits), T, gamma, stochastic=0.0))

    # step-by-step host rollout per member
    for k in range(ens.n_models):
        member = jax.tree_util.tree_map(lambda l: l[k], ep)
        x = inits.copy()
        total = 0.0
        for t in range(T):
            u = np.asarray(policy.act(pp, jnp.asarray(x), clip=True))
            xgu = np.concatenate([x, u], axis=1)
            x_next = np.asarray(ens.apply_member(
                member, jnp.asarray(xgu), in_stats, diff_stats))
            total += (gamma ** t) * float(np.mean(env.cost_np_vec(x, u, x_next)))
            x = x_next
        np.testing.assert_allclose(costs[k], total, rtol=1e-4)


def test_svg_manual_recursion_matches_autodiff():
    """The reference's SVG backward recursion and jax.grad through the scan
    must produce the same policy gradient on a simulated trajectory."""
    env, policy, ens, pp, ep, in_stats, diff_stats = _setup()
    member0 = jax.tree_util.tree_map(lambda l: l[0], ep)
    T = 6
    s0 = np.random.randn(2).astype(np.float32)

    # simulate a trajectory with the same (unclipped) policy + member 0
    traj = []
    s = jnp.asarray(s0)
    for t in range(T):
        a = policy.mean(pp, s[None])[0]
        s_next = ens.apply_member(member0, jnp.concatenate([s, a])[None],
                                  in_stats, diff_stats)[0]
        traj.append((np.asarray(s), np.asarray(a), np.asarray(s_next)))
        s = s_next

    manual = manual_svg_gradient(policy, ens, env.cost, pp, member0,
                                 in_stats, diff_stats, [traj], gamma=1.0)

    auto_tree = jax.grad(svg_objective, argnums=3)(
        policy, ens, env.cost, pp, member0, in_stats, diff_stats,
        jnp.asarray(s0)[None], T, 1.0)
    auto = np.asarray(tree_flatten_vector(auto_tree))

    np.testing.assert_allclose(manual, auto, rtol=1e-3, atol=1e-5)


def test_discount_cumsum_matches_numpy():
    x = np.random.randn(4, 9).astype(np.float32)
    g = 0.95
    out = np.asarray(discount_cumsum(jnp.asarray(x), g))
    for b in range(4):
        ref = np.zeros(9)
        acc = 0.0
        for t in reversed(range(9)):
            acc = x[b, t] + g * acc
            ref[t] = acc
        np.testing.assert_allclose(out[b], ref, rtol=1e-5)


def test_gae_matches_per_path_numpy():
    B, T = 3, 8
    rewards = np.random.randn(B, T).astype(np.float32)
    values = np.random.randn(B, T).astype(np.float32)
    valids = np.ones((B, T), np.float32)
    valids[1, 5:] = 0.0  # one truncated path
    gamma, lam = 0.99, 0.95
    adv, ret = gae_advantages(jnp.asarray(rewards), jnp.asarray(values),
                              jnp.asarray(valids), gamma, lam)
    adv = np.asarray(adv)
    for b in range(B):
        L = int(valids[b].sum())
        v = np.append(values[b, :L], 0.0)
        deltas = rewards[b, :L] + gamma * v[1:] - v[:-1]
        ref = np.zeros(L)
        acc = 0.0
        for t in reversed(range(L)):
            acc = deltas[t] + gamma * lam * acc
            ref[t] = acc
        np.testing.assert_allclose(adv[b, :L], ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(adv[b, L:], 0.0)
