"""Algorithm-level tests: TRPO trust region, VPG/PPO improvement,
L-BFGS convergence, NPG."""

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.algos.lbfgs import make_lbfgs_optimize
from metrpo_tpu.algos.npg import make_npg_update
from metrpo_tpu.algos.ppo import PpoConfig, make_ppo_update
from metrpo_tpu.algos.trpo import make_trpo_update
from metrpo_tpu.algos.vpg import make_vpg_update
from metrpo_tpu.config import (DynamicsModelParams, PolicyModelParams,
                               PolicyOptParams, TrpoParams, VpgParams)
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.imagine import ImaginedBatch, rollout_trajectories
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.cg import conjugate_gradient
from metrpo_tpu.ops.distributions import gaussian_kl
from metrpo_tpu.utils.normalizer import running_stats_init, running_stats_update


def _fake_batch(policy, params, key, B=32, T=10, S=4, A=2):
    """Synthetic trajectory batch where advantage = +1 for positive first
    action dim — a trivially improvable signal."""
    k1, k2 = jax.random.split(key)
    obs = jax.random.normal(k1, (B, T, S))
    mean, logstd = policy.dist(params, obs)
    acts = mean + jax.random.normal(k2, mean.shape) * jnp.exp(logstd)
    rewards = jnp.where(acts[..., 0] > 0, 1.0, -1.0)
    return ImaginedBatch(obs, acts, mean, logstd, rewards,
                         jnp.ones((B, T)))


def test_cg_solves_linear_system():
    np.random.seed(0)
    M = np.random.randn(8, 8)
    A = M @ M.T + 0.5 * np.eye(8)
    b = np.random.randn(8)
    x = np.asarray(conjugate_gradient(
        lambda v: jnp.asarray(A) @ v, jnp.asarray(b, jnp.float32), iters=30))
    np.testing.assert_allclose(A @ x, b, rtol=1e-3, atol=1e-3)


def test_trpo_respects_trust_region_and_improves():
    policy = GaussianMLPPolicy.create(4, 2, PolicyModelParams(hidden_layers=(16,)))
    params = policy.init(jax.random.PRNGKey(0))
    cfg = TrpoParams(step_size=0.01)
    update = make_trpo_update(policy, cfg)
    batch = _fake_batch(policy, params, jax.random.PRNGKey(1))
    new_params, stats = update(params, batch)
    assert bool(stats.step_accepted)
    assert float(stats.surrogate_after) < float(stats.surrogate_before)
    # actual KL(old || new) within the trust region (+ small line-search slack)
    mean_o, logstd_o = policy.dist(params, batch.observations)
    mean_n, logstd_n = policy.dist(new_params, batch.observations)
    kl = float(jnp.mean(gaussian_kl(mean_o, logstd_o, mean_n, logstd_n)))
    assert kl <= cfg.step_size * 1.1, kl


def test_npg_single_step():
    policy = GaussianMLPPolicy.create(4, 2, PolicyModelParams(hidden_layers=(16,)))
    params = policy.init(jax.random.PRNGKey(0))
    update = make_npg_update(policy, TrpoParams(step_size=0.01))
    batch = _fake_batch(policy, params, jax.random.PRNGKey(1))
    new_params, stats = update(params, batch)
    assert int(stats.backtracks) == 1


def test_vpg_improves_surrogate():
    policy = GaussianMLPPolicy.create(4, 2, PolicyModelParams(hidden_layers=(16,)))
    params = policy.init(jax.random.PRNGKey(0))
    update, opt_init = make_vpg_update(policy, VpgParams(learning_rate=1e-2))
    opt_state = opt_init(params)
    batch = _fake_batch(policy, params, jax.random.PRNGKey(1))
    p, opt_state, s0 = update(params, opt_state, batch)
    for _ in range(10):
        p, opt_state, s = update(p, opt_state, batch)
    # policy should now favor positive first action dim
    mean, _ = policy.dist(p, batch.observations)
    mean0, _ = policy.dist(params, batch.observations)
    assert float(jnp.mean(mean[..., 0])) > float(jnp.mean(mean0[..., 0]))


def test_ppo_clip_and_adaptive_kl():
    policy = GaussianMLPPolicy.create(4, 2, PolicyModelParams(hidden_layers=(16,)))
    params = policy.init(jax.random.PRNGKey(0))
    update, init_state = make_ppo_update(
        policy, PpoConfig(n_epochs=5, use_kl_penalty=True, kl_target=1e-7))
    state = init_state(params)
    batch = _fake_batch(policy, params, jax.random.PRNGKey(1))
    p, state, stats = update(params, state, batch)
    assert np.isfinite(float(stats.loss))
    assert 0.0 <= float(stats.clip_fraction) <= 1.0
    # with a tiny KL target the penalty must have adapted upward
    assert float(state.kl_coeff) > 1.0


def test_lbfgs_descends_rollout_cost():
    env = Point2DEnv()
    policy = GaussianMLPPolicy.create(2, 2, PolicyModelParams(hidden_layers=(8,)))
    ens = DynamicsEnsemble.create(2, 2, 0, DynamicsModelParams(
        hidden_layers=(16,), nonlinearity=("relu",)), 2)
    pp = policy.init(jax.random.PRNGKey(0))
    ep = ens.init(jax.random.PRNGKey(1))
    in_stats = running_stats_update(running_stats_init(4), np.random.randn(50, 4))
    diff_stats = running_stats_update(running_stats_init(2),
                                      0.1 * np.random.randn(50, 2))
    pop = PolicyOptParams(T=5, oracle_maxtimestep=5, batch_size=4)
    optimize = make_lbfgs_optimize(policy, ens, env.cost, None, None, pop,
                                   max_iters=25)
    inits = jnp.asarray(np.random.randn(4, 2), jnp.float32)

    from metrpo_tpu.imagine import bptt_costs
    before = float(jnp.mean(bptt_costs(
        policy, ens, env.cost, None, None, pp, ep, in_stats, diff_stats,
        inits, 5, 1.0)))
    new_pp, final_cost, n_iters = optimize(pp, ep, in_stats, diff_stats, inits)
    after = float(jnp.mean(bptt_costs(
        policy, ens, env.cost, None, None, new_pp, ep, in_stats, diff_stats,
        inits, 5, 1.0)))
    assert after < before, (before, after)
    assert int(n_iters) > 0


def test_rollout_sam_modes():
    env = Point2DEnv()
    policy = GaussianMLPPolicy.create(2, 2, PolicyModelParams(hidden_layers=(8,)))
    ens = DynamicsEnsemble.create(2, 2, 0, DynamicsModelParams(
        hidden_layers=(16,), nonlinearity=("relu",)), 3)
    pp = policy.init(jax.random.PRNGKey(0))
    ep = ens.init(jax.random.PRNGKey(1))
    in_stats = running_stats_update(running_stats_init(4), np.random.randn(50, 4))
    diff_stats = running_stats_update(running_stats_init(2),
                                      0.1 * np.random.randn(50, 2))
    inits = jnp.asarray(np.random.randn(6, 2), jnp.float32)
    for mode in ("step_rand", "eps_rand", "model_mean", "model_mean_std",
                 "model_med", "one_model"):
        batch = rollout_trajectories(
            policy, ens, env.cost, None, pp, ep, in_stats, diff_stats,
            inits, 4, jax.random.PRNGKey(2), sam_mode=mode)
        assert batch.observations.shape == (6, 4, 2), mode
        assert np.all(np.isfinite(np.asarray(batch.rewards))), mode


def test_step_rand_ragged_equals_all_k():
    """The ragged (grouped-matmul) step_rand execution is an execution
    strategy only: same key -> same member draws -> identical
    trajectories (up to matmul-tiling fp noise) as the all-members-then-
    gather path. B=7 with K=3 exercises uneven (multinomial) group
    sizes incl. potential empty groups."""
    env = Point2DEnv()
    policy = GaussianMLPPolicy.create(2, 2, PolicyModelParams(hidden_layers=(8,)))
    ens = DynamicsEnsemble.create(2, 2, 0, DynamicsModelParams(
        hidden_layers=(16,), nonlinearity=("relu",)), 3)
    pp = policy.init(jax.random.PRNGKey(0))
    ep = ens.init(jax.random.PRNGKey(1))
    in_stats = running_stats_update(running_stats_init(4), np.random.randn(50, 4))
    diff_stats = running_stats_update(running_stats_init(2),
                                      0.1 * np.random.randn(50, 2))
    inits = jnp.asarray(np.random.randn(7, 2), jnp.float32)
    ref = rollout_trajectories(
        policy, ens, env.cost, None, pp, ep, in_stats, diff_stats,
        inits, 9, jax.random.PRNGKey(2), sam_mode="step_rand")
    out = rollout_trajectories(
        policy, ens, env.cost, None, pp, ep, in_stats, diff_stats,
        inits, 9, jax.random.PRNGKey(2), sam_mode="step_rand",
        step_rand_impl="ragged")
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_rollout_unroll_is_semantics_preserving():
    """unroll is a scheduling knob only: identical trajectories for any
    unroll factor (incl. T not divisible by it) and a fixed key."""
    env = Point2DEnv()
    policy = GaussianMLPPolicy.create(2, 2, PolicyModelParams(hidden_layers=(8,)))
    ens = DynamicsEnsemble.create(2, 2, 0, DynamicsModelParams(
        hidden_layers=(16,), nonlinearity=("relu",)), 3)
    pp = policy.init(jax.random.PRNGKey(0))
    ep = ens.init(jax.random.PRNGKey(1))
    in_stats = running_stats_update(running_stats_init(4), np.random.randn(50, 4))
    diff_stats = running_stats_update(running_stats_init(2),
                                      0.1 * np.random.randn(50, 2))
    inits = jnp.asarray(np.random.randn(6, 2), jnp.float32)
    for mode in ("step_rand", "step_rand_balanced"):
        ref = rollout_trajectories(
            policy, ens, env.cost, None, pp, ep, in_stats, diff_stats,
            inits, 7, jax.random.PRNGKey(2), sam_mode=mode, unroll=1)
        for unroll in (2, 4):
            out = rollout_trajectories(
                policy, ens, env.cost, None, pp, ep, in_stats, diff_stats,
                inits, 7, jax.random.PRNGKey(2), sam_mode=mode, unroll=unroll)
            for a, b in zip(ref, out):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-6)
