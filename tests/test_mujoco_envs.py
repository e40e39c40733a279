"""MuJoCo env family tests: obs layouts, cost == -reward invariant,
reset_to round-trip, analytic done (ant)."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from metrpo_tpu.envs import get_env

# env name -> expected obs dim (reference layouts, SURVEY.md 2.24-2.33)
OBS_DIMS = {
    "swimmer": 10,
    "snake": 14,
    "half-cheetah": 18,
    "hopper": 11,
    "ant": 29,
    "reacher": 6,
    "walker2d": 18,
}

# envs whose reward is exactly -cost(x, u, x') on every step
COST_CONSISTENT = ["swimmer", "snake", "half-cheetah", "hopper", "ant",
                   "reacher", "walker2d", "humanoid"]


@pytest.mark.parametrize("name", sorted(OBS_DIMS))
def test_obs_dims(name):
    env = get_env(name)
    obs = env.reset()
    assert obs.shape == (OBS_DIMS[name],), f"{name}: {obs.shape}"
    assert env.n_obs == OBS_DIMS[name]


@pytest.mark.parametrize("name", COST_CONSISTENT)
def test_cost_equals_neg_reward(name):
    # the reference's runtime invariant (env_helpers.py:422-431)
    np.random.seed(0)
    env = get_env(name)
    obs = env.reset()
    O, A, R = [obs], [], []
    for _ in range(20):
        a = np.random.uniform(-1, 1, env.n_actions)
        obs, r, done, _ = env.step(a)
        O.append(obs)
        A.append(a)
        R.append(r)
        if done:
            break
    O, A, R = np.asarray(O), np.asarray(A), np.asarray(R)
    costs = env.cost_np_vec(O[:-1], A, O[1:])
    np.testing.assert_allclose(costs, -R, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["swimmer", "half-cheetah", "ant"])
def test_reset_to_roundtrip(name):
    np.random.seed(0)
    env = get_env(name)
    env.reset()
    for _ in range(5):
        env.step(np.random.uniform(-1, 1, env.n_actions))
    state = env.get_reset_state()
    obs_a = env.get_current_obs()
    # state restore reproduces the observation (model_based_rl.py:474-475)
    obs_b = env.reset_to(state)
    # COM-derived quantities re-derive to ~1e-6 (kinematics recompute)
    np.testing.assert_allclose(obs_a, obs_b, rtol=1e-4, atol=1e-5)


def test_ant_analytic_done():
    env = get_env("ant")
    assert env.has_analytic_done
    x = np.zeros((3, env.n_obs), dtype=np.float32)
    x_next = x.copy()
    x_next[0, 2] = 0.5   # healthy
    x_next[1, 2] = 0.1   # fallen
    x_next[2, 2] = 1.5   # jumped too high
    d = env.is_done_np(x, x_next)
    assert list(d) == [False, True, True]


def test_ant_done_matches_step():
    np.random.seed(1)
    env = get_env("ant")
    obs = env.reset()
    for _ in range(50):
        prev = obs
        obs, r, done, _ = env.step(np.random.uniform(-1, 1, env.n_actions))
        assert done == bool(env.is_done_np(prev[None], obs[None])[0])
        if done:
            break


def test_reacher_goal_split():
    env = get_env("reacher")
    assert env.n_goals == 2
    assert env.n_states == 4
    obs = env.reset()
    # goal stays fixed within an episode
    o2, _, _, _ = env.step(np.zeros(2))
    np.testing.assert_allclose(obs[-2:], o2[-2:])


def test_snake_moves():
    np.random.seed(0)
    env = get_env("snake")
    obs0 = env.reset()
    for t in range(50):
        obs, r, _, _ = env.step(np.sin(0.3 * t + np.arange(4) * 1.5))
    # the authored snake.xml must actually swim (COM moves)
    assert abs(obs[0] - obs0[0]) > 1e-3


def test_simple_humanoid_distinct_model():
    """SimpleHumanoid runs the reduced 10-DOF model, HumanoidEnv the full
    one — two distinct physics like the reference's simple_humanoid.xml vs
    humanoid.xml (com_humanoid_env.py:1-6; VERDICT r1 missing #4)."""
    simple = get_env("simple-humanoid")
    full = get_env("humanoid")
    assert simple.model.nu == 10
    assert full.model.nu > simple.model.nu
    assert full.model.nq > simple.model.nq
    # same env contract: obs = qpos[3:] + qvel + head xyz
    assert simple.n_obs == (simple.model.nq - 3) + simple.model.nv + 3
    assert full.n_obs == (full.model.nq - 3) + full.model.nv + 3
    # cost == -reward holds on the reduced model too
    np.random.seed(0)
    obs = simple.reset()
    O, A, R = [obs], [], []
    for _ in range(10):
        a = np.random.uniform(-1, 1, simple.n_actions)
        obs, r, done, _ = simple.step(a)
        O.append(obs); A.append(a); R.append(r)
    costs = simple.cost_np_vec(np.asarray(O[:-1]), np.asarray(A),
                               np.asarray(O[1:]))
    np.testing.assert_allclose(costs, -np.asarray(R), rtol=1e-4, atol=1e-6)
