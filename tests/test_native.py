"""Native C++ batched stepper == serial python stepping, bitwise.

The native thread-pool stepper (metrpo_tpu/native) replaces the reference's
fork-based ParallelVecEnvExecutor (reference
envs/parallel_vec_env_executor.py:78-176); these tests prove the fast path
produces bitwise-identical transitions to the per-env python loop, across
the three env-step shapes: plain locomotion (swimmer), analytic-done (ant),
and pre-step-observation reward (reacher).
"""

import numpy as np
import pytest

from metrpo_tpu.envs import get_env
from metrpo_tpu.envs.base import VecHostEnv
from metrpo_tpu.native import native_available, native_error


def _rollout(env_name, native, states, actions):
    pool = VecHostEnv(
        [get_env(env_name, seed=0) for _ in range(states.shape[0])],
        native=native)
    obs = [pool.reset_to_batch(states)]
    rewards, dones = [], []
    for a in actions:
        o, r, d, _ = pool.step_batch(a)
        obs.append(o)
        rewards.append(r)
        dones.append(d)
    return pool, np.stack(obs), np.stack(rewards), np.stack(dones)


@pytest.mark.skipif(not native_available(),
                    reason=f"native stepper unavailable: {native_error()}")
@pytest.mark.parametrize("env_name", ["swimmer", "snake", "half-cheetah",
                                      "hopper", "ant", "reacher"])
def test_native_matches_python_bitwise(env_name):
    n, horizon = 3, 12
    e0 = get_env(env_name, seed=0)
    rng = np.random.default_rng(7)
    states = np.stack([e0.get_reset_state() for _ in range(n)])
    states = states + rng.normal(scale=0.01, size=states.shape)
    actions = rng.uniform(-1, 1, size=(horizon, n, e0.n_actions))

    pool_n, o1, r1, d1 = _rollout(env_name, True, states, actions)
    pool_p, o2, r2, d2 = _rollout(env_name, False, states, actions)

    assert pool_n.native_active and not pool_p.native_active
    # locomotion pools take the fully-batched C++-extraction post_step
    # path; reacher (pre_step hook) must stay on the per-env python path
    if env_name == "reacher":
        assert pool_n._batch_post is None
    else:
        assert pool_n._batch_post is not None
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(d1, d2)


@pytest.mark.skipif(not native_available(),
                    reason=f"native stepper unavailable: {native_error()}")
def test_native_pool_reuse_across_episodes():
    # the pointer arrays captured at pool construction must stay valid
    # through resets (mj_resetData mutates in place, never reallocates)
    pool = VecHostEnv([get_env("swimmer", seed=0) for _ in range(2)])
    assert pool.native_active
    rng = np.random.default_rng(0)
    for _ in range(3):
        obs = pool.reset_batch()
        assert np.isfinite(obs).all()
        for _ in range(5):
            o, r, d, _ = pool.step_batch(
                rng.uniform(-1, 1, size=(2, pool.envs[0].n_actions)))
        assert np.isfinite(o).all() and np.isfinite(r).all()


def test_non_mujoco_pool_falls_back():
    pool = VecHostEnv([get_env("point2D") for _ in range(2)])
    assert not pool.native_active
    obs = pool.reset_batch()
    o, r, d, _ = pool.step_batch(np.zeros((2, pool.envs[0].n_actions)))
    assert o.shape == obs.shape
