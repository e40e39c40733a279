"""COM-observation -> simulator-state reset reconstruction.

The reference seeds rollouts from observation-space inits:
``reset(init_state=obs)`` rebuilds qpos/qvel from the COM observation
(``get_original_representation``, reference envs/com_swimmer_env.py:16-32,
invoked at :81-82) and the round-trip invariant is asserted at
``model_based_rl.py:474-475`` (reset from a recorded state must reproduce
the recorded observation).  Here the reconstruction is generic + exact
(``MujocoHostEnv.reset_from_obs``); this test is that invariant for all
five COM locomotion envs.
"""

import numpy as np
import pytest

from metrpo_tpu.envs.mujoco.locomotion import (AntEnv, HalfCheetahEnv,
                                               HopperEnv, SnakeEnv,
                                               SwimmerEnv)

ENVS = [SwimmerEnv, SnakeEnv, HalfCheetahEnv, HopperEnv, AntEnv]


@pytest.mark.parametrize("env_cls", ENVS, ids=lambda c: c.__name__)
def test_obs_reset_round_trip(env_cls):
    env = env_cls(seed=0)
    rng = np.random.default_rng(3)
    env.reset()
    for _ in range(5):  # reach a generic (non-rest) state
        env.step(rng.uniform(-1, 1, env.action_space.low.shape[0]))
    target = env.get_current_obs()

    # scramble the sim, then reconstruct purely from the observation
    env.reset()
    rebuilt = env.reset(init_state=target)
    np.testing.assert_allclose(rebuilt, target, rtol=1e-9, atol=1e-9)

    # the rebuilt state must CONTINUE like the original: same action ->
    # same next obs (state reconstruction, not just obs matching)
    a = rng.uniform(-1, 1, env.action_space.low.shape[0])
    obs_a = env.step(a)[0]
    env.reset(init_state=target)
    obs_b = env.step(a)[0]
    np.testing.assert_allclose(obs_a, obs_b, rtol=1e-8, atol=1e-8)


def test_swimmer_matches_reference_analytic_form():
    """The reference's swimmer-specific analytic reconstruction
    (com_swimmer_env.py:16-32) subtracts per-link COM offsets with mass
    fractions; ours must land on a state whose raw qpos[:2]/qvel[:2]
    reproduce the same observation — verified via the sim itself by
    comparing against get_reset_state round-trip."""
    env = SwimmerEnv(seed=0)
    rng = np.random.default_rng(0)
    env.reset()
    for _ in range(3):
        env.step(rng.uniform(-1, 1, 2))
    raw = env.get_reset_state()
    obs = env.get_current_obs()
    obs2 = env.reset(init_state=obs)
    raw2 = env.get_reset_state()
    np.testing.assert_allclose(raw2, raw, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(obs2, obs, rtol=1e-9, atol=1e-9)


def test_hopper_unobserved_rootx_is_zeroed():
    """Hopper's obs has no COM x; reconstruction pins rootx to 0 (the
    dynamics are x-translation invariant) while matching everything else."""
    env = HopperEnv(seed=0)
    rng = np.random.default_rng(1)
    env.reset()
    for _ in range(5):
        env.step(rng.uniform(-1, 1, 3))
    target = env.get_current_obs()
    env.reset(init_state=target)
    assert abs(env.data.qpos[0]) < 1e-12
    np.testing.assert_allclose(env.get_current_obs(), target,
                               rtol=1e-9, atol=1e-9)


def test_reference_format_validation_init_pickle(tmp_path):
    """The reference's validation_init_path pickle is a bare array of
    OBSERVATIONS (model_based_rl.py:446-449).  The Trainer loader accepts
    that format, reconstructs raw reset states via reset_from_obs, and
    enforces the reference's round-trip invariant (:474-475)."""
    import logging
    import pickle
    import types

    from metrpo_tpu.orchestrator import Trainer

    env = SwimmerEnv(seed=0)
    rng = np.random.default_rng(0)
    obs_list = []
    for _ in range(3):
        env.reset()
        for _ in range(4):
            env.step(rng.uniform(-1, 1, 2))
        obs_list.append(env.get_current_obs())
    vip = str(tmp_path / "vip.pkl")
    with open(vip, "wb") as f:
        pickle.dump(np.asarray(obs_list), f)  # reference format: obs only

    shim = types.SimpleNamespace(env=env, logger=logging.getLogger("t"))
    pop = types.SimpleNamespace(validation_init_path=vip, batch_size=3)
    obs_inits, reset_inits = Trainer._load_or_make_validation_inits(shim, pop)
    assert obs_inits.shape == (3, 10)
    assert reset_inits.shape == (3, 10)  # nq + nv
    for o, r in zip(obs_inits, reset_inits):
        np.testing.assert_allclose(env.reset_to(r), o, atol=1e-8)
