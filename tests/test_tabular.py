"""Tabular logger + collect-invariant tests."""

import csv
import os

import numpy as np
import pytest

from metrpo_tpu.utils.tabular import TabularLogger


def test_tabular_header_evolves(tmp_path):
    path = str(tmp_path / "progress.csv")
    t = TabularLogger(path)
    t.record("a", 1)
    t.dump()
    t.record("a", 2)
    t.record("b", 3.5)  # new column appears later
    t.dump()
    rows = list(csv.DictReader(open(path)))
    assert rows[0]["a"] == "1" and rows[0]["b"] == ""
    assert rows[1]["a"] == "2" and rows[1]["b"] == "3.5"


def test_tabular_resume_appends_preserving_history(tmp_path):
    """A second logger on an existing progress.csv (the -resume case)
    preloads its rows: history survives both plain appends AND the
    header-growing rewrite."""
    path = str(tmp_path / "progress.csv")
    t = TabularLogger(path)
    t.record("a", 1)
    t.dump()
    del t
    t2 = TabularLogger(path, resume=True)
    t2.record("a", 2)
    t2.dump()                  # same header -> append
    t2.record("a", 3)
    t2.record("b", 9)          # new column -> rewrite path
    t2.dump()
    rows = list(csv.DictReader(open(path)))
    assert [r["a"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["b"] == "" and rows[2]["b"] == "9"


def test_collect_checks_ant_done_invariant():
    """The collector must assert done == analytic is_done per step
    (env_helpers.py:410-411) — drive it on ant where done can fire."""
    mujoco = pytest.importorskip("mujoco")
    import jax
    from metrpo_tpu.collect import collect_real_rollouts
    from metrpo_tpu.config import ExplorationParams, PolicyModelParams
    from metrpo_tpu.envs import get_env
    from metrpo_tpu.envs.base import VecHostEnv
    from metrpo_tpu.models.policy import GaussianMLPPolicy

    np.random.seed(0)
    env = get_env("ant")
    pool = VecHostEnv([get_env("ant") for _ in range(3)])
    pol = GaussianMLPPolicy.create(env.n_obs, env.n_actions, PolicyModelParams())
    pp = pol.init(jax.random.PRNGKey(0))
    Os, As, Rs, info = collect_real_rollouts(
        env, pool, pol, pp, None,
        ExplorationParams(action_noise=1.0), sample_size=60, max_timestep=25,
        key=jax.random.PRNGKey(1), check_invariants=True)
    assert info.timesteps >= 60
    # ant episodes may terminate early: every episode obs array is one
    # longer than its action array
    for o, a in zip(Os, As):
        assert len(o) == len(a) + 1


def test_collect_auto_reset_respawns_slots():
    """Finished episodes must respawn immediately (auto-reset batch,
    vectorized_sampler.py semantics): a 2-env pool still fills a large
    sample budget, every episode is <= max_timestep, and short episodes
    ended by a real done."""
    pytest.importorskip("mujoco")
    import jax
    from metrpo_tpu.collect import collect_real_rollouts
    from metrpo_tpu.config import ExplorationParams, PolicyModelParams
    from metrpo_tpu.envs import get_env
    from metrpo_tpu.envs.base import VecHostEnv
    from metrpo_tpu.models.policy import GaussianMLPPolicy

    np.random.seed(0)
    env = get_env("ant")
    pool = VecHostEnv([get_env("ant") for _ in range(2)])
    pol = GaussianMLPPolicy.create(env.n_obs, env.n_actions, PolicyModelParams())
    pp = pol.init(jax.random.PRNGKey(0))
    Os, As, Rs, info = collect_real_rollouts(
        env, pool, pol, pp, None,
        ExplorationParams(action_noise=1.0), sample_size=120, max_timestep=10,
        key=jax.random.PRNGKey(1), check_invariants=True)
    assert info.timesteps >= 120
    assert info.episodes >= 12  # 2 slots x >=6 respawn generations
    for o, a in zip(Os, As):
        assert 1 <= len(a) <= 10
        if len(a) < 10:  # early end must be a genuine env done
            assert env.is_done_np(o[-2][None], o[-1][None])[0]


def test_tabular_fresh_run_rotates_stale_csv(tmp_path):
    """A NON-resume logger on a dir with an existing progress.csv must not
    append after the stale run's history (ADVICE r3): the old file is
    rotated aside and the new run starts a clean CSV."""
    path = str(tmp_path / "progress.csv")
    t = TabularLogger(path)
    t.record("Itr", 0)
    t.dump()
    del t
    t2 = TabularLogger(path)  # fresh run reusing the dir
    t2.record("Itr", 0)
    t2.dump()
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 1
    old = list(csv.DictReader(open(path + ".old1")))
    assert len(old) == 1
