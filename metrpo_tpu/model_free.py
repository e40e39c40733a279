"""Standalone model-free policy optimization on the real environment.

The reference's ``BatchPolopt`` carries its own model-free ``train()``
loop with snapshotting and a fixed-init evaluator
(``algos/batch_polopt.py:110-235``), unused by the ME-TRPO path but part
of the framework surface.  This is the in-tree equivalent: collect real
trajectories with the stochastic policy, pack them into the fixed-shape
batch, and run the jitted TRPO/VPG/PPO update — the same update programs
the imagination path uses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.algos.trpo import make_trpo_update
from metrpo_tpu.algos.vpg import make_vpg_update
from metrpo_tpu.config import TrpoParams, VpgParams
from metrpo_tpu.envs.base import HostEnv, VecHostEnv
from metrpo_tpu.imagine import ImaginedBatch
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.prng import KeySequence
from metrpo_tpu.utils.tabular import TabularLogger


def make_mean_fn(policy: GaussianMLPPolicy):
    """ONE cached jitted policy-mean fn, pinned to the host CPU backend
    when available (the per-step real-env loop is round-trip bound; see
    evaluate.make_pinned_fn)."""
    from metrpo_tpu.evaluate import make_pinned_fn
    return make_pinned_fn(lambda p, o: policy.dist(p, o)[0],
                          prefer_cpu=True)


def collect_real_batch(env_pool: VecHostEnv, policy: GaussianMLPPolicy,
                       policy_params: dict, T: int, key,
                       mean_fn=None) -> ImaginedBatch:
    """Roll every env in the pool T steps with the stochastic policy and
    pack a fixed-shape (B, T) batch with validity masking."""
    B = len(env_pool)
    obs = env_pool.reset_batch()
    if mean_fn is None:
        mean_fn = make_mean_fn(policy)
    policy_params = mean_fn.prepare(policy_params)

    o_hist = np.zeros((B, T, obs.shape[1]), np.float32)
    a_hist = np.zeros((B, T, policy.n_actions), np.float32)
    m_hist = np.zeros_like(a_hist)
    r_hist = np.zeros((B, T), np.float32)
    v_hist = np.zeros((B, T), np.float32)
    alive = np.ones(B, bool)
    logstd = np.asarray(policy_params["logstd"])
    for t in range(T):
        mean = np.asarray(mean_fn(policy_params, np.asarray(obs, np.float32)))
        a = mean + np.random.randn(*mean.shape) * np.exp(logstd)
        a_clip = np.clip(a, np.asarray(policy.action_low),
                         np.asarray(policy.action_high))
        next_obs, rewards, dones, _ = env_pool.step_batch(a_clip)
        o_hist[:, t] = obs
        a_hist[:, t] = a
        m_hist[:, t] = mean
        r_hist[:, t] = rewards
        v_hist[:, t] = alive.astype(np.float32)
        alive &= ~np.asarray(dones, bool)
        obs = next_obs
        if not alive.any():
            break
    B_, T_ = r_hist.shape
    logstds = np.broadcast_to(logstd, (B_, T_, policy.n_actions))
    return ImaginedBatch(
        observations=jnp.asarray(o_hist), actions=jnp.asarray(a_hist),
        means=jnp.asarray(m_hist), logstds=jnp.asarray(logstds),
        rewards=jnp.asarray(r_hist), valids=jnp.asarray(v_hist))


def train_model_free(env: HostEnv, env_factory, policy_cfg,
                     algo: str = "trpo",
                     n_itr: int = 100,
                     batch_size: int = 5000,
                     max_path_length: int = 100,
                     discount: float = 0.99,
                     seed: int = 0,
                     snapshot_dir: Optional[str] = None,
                     logger=None,
                     progress_callback=None,
                     resume: bool = False) -> tuple[dict, list]:
    """Model-free TRPO/VPG on the real env. Returns (params, return_curve).

    ``progress_callback(itr, mean_return)`` is invoked after every
    iteration (used by scripts/exp_sample_efficiency.py to stream the
    curve to disk during long runs)."""
    keys = KeySequence(seed)
    policy = GaussianMLPPolicy.create(env.n_obs, env.n_actions, policy_cfg,
                                      env.action_space.low, env.action_space.high)
    params = policy.init(keys.next())
    n_envs = max(batch_size // max_path_length, 1)
    pool = VecHostEnv([env_factory() for _ in range(n_envs)])

    if algo == "trpo":
        update = make_trpo_update(policy, TrpoParams(discount=discount))
        opt_state = None
    elif algo == "vpg":
        update_fn, opt_init = make_vpg_update(policy, VpgParams(discount=discount))
        opt_state = opt_init(params)
        update = lambda p, b: update_fn(p, opt_state, b)[:2]
    else:
        raise ValueError(algo)

    # resume=True preloads an existing progress.csv so a continued
    # baseline appends one continuous CSV instead of rotating it aside
    # (ADVICE r4 — mirrors train.py's Trainer resume plumbing)
    tab = TabularLogger(None if snapshot_dir is None else
                        f"{snapshot_dir}/progress.csv", resume=resume)
    curve = []
    mean_fn = make_mean_fn(policy)
    for itr in range(n_itr):
        batch = collect_real_batch(pool, policy, params, max_path_length,
                                   keys.next(), mean_fn=mean_fn)
        if algo == "trpo":
            params, stats = update(params, batch)
        else:
            params, opt_state = update(params, batch)
        mean_ret = float(jnp.sum(batch.rewards * batch.valids) /
                         jnp.maximum(jnp.sum(batch.valids[:, :1]), 1.0))
        curve.append(mean_ret)
        tab.record("Iteration", itr)
        tab.record("AverageReturn", mean_ret)
        tab.dump()
        if logger:
            logger.info("itr %d AverageReturn %.2f", itr, mean_ret)
        if progress_callback:
            progress_callback(itr + 1, mean_ret)
    return params, curve
