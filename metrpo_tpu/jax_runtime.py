"""Fully on-device real-env runtime for pure-JAX envs.

For envs whose TRUE dynamics are jnp (Point2D, PointMass), real-env data
collection and the fixed-init oracle evaluation run as single jitted scans
on device — no per-step host<->device transfers at all.  This is the
TPU-native upgrade over the reference's one-sess.run-per-step collector
(env_helpers.py:352-454) and pickle-cloned oracle (env_helpers.py:476-504);
MuJoCo envs keep the batched host path (collect.py / evaluate.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.config import ExplorationParams
from metrpo_tpu.envs.base import JaxEnv
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.tree import tree_flatten_vector, tree_unflatten_vector


def make_device_collector(env: JaxEnv, policy: GaussianMLPPolicy,
                          exploration: ExplorationParams, T: int):
    """Jitted batched collector: n_episodes parallel episodes, per-episode
    parameter-space noise, per-step action noise, all in one scan."""

    @functools.partial(jax.jit, static_argnames=("n_episodes",))
    def collect(policy_params, diff_weights, key, n_episodes: int):
        k_init, k_perturb, k_roll = jax.random.split(key, 3)
        inits = jax.vmap(env.initial_state)(
            jax.random.split(k_init, n_episodes))

        flat = tree_flatten_vector(policy_params)
        noise = jax.random.normal(k_perturb, (n_episodes, flat.shape[0])) \
            * diff_weights * exploration.param_noise
        param_stack = jax.vmap(
            lambda f: tree_unflatten_vector(f, policy_params))(flat[None] + noise)

        def step(carry, k):
            state = carry
            k_act, k_scale = jax.random.split(k)
            obs = jax.vmap(env.observe)(state)
            a = jax.vmap(lambda p, o: policy.mean(p, o[None])[0])(
                param_stack, obs)
            if exploration.vary_trajectory_noise:
                scale = jax.random.uniform(k_scale, (n_episodes, 1))
            else:
                scale = 1.0
            a = a + exploration.action_noise * scale * \
                jax.random.normal(k_act, a.shape)
            a = jnp.clip(a, policy.action_low, policy.action_high)
            next_state = jax.vmap(env.dynamics)(state, a)
            next_obs = jax.vmap(env.observe)(next_state)
            reward = -env.cost(obs, a, next_obs)
            return next_state, (obs, a, reward, next_obs)

        keys = jax.random.split(k_roll, T)
        last_state, (obs, acts, rewards, next_obs) = jax.lax.scan(
            step, inits, keys)
        # (T, B, .) -> (B, T, .)
        tr = lambda x: jnp.swapaxes(x, 0, 1)
        return tr(obs), tr(acts), tr(rewards), tr(next_obs), \
            jnp.mean(jnp.abs(noise))

    return collect


def make_device_oracle(env: JaxEnv, policy: GaussianMLPPolicy,
                       T: int, gamma: float = 1.0):
    """Jitted fixed-init deterministic real-env rollout cost."""

    @jax.jit
    def oracle(policy_params, init_states):
        def step(carry, t):
            state, acc = carry
            obs = jax.vmap(env.observe)(state)
            a = jnp.clip(policy.mean(policy_params, obs),
                         policy.action_low, policy.action_high)
            next_state = jax.vmap(env.dynamics)(state, a)
            next_obs = jax.vmap(env.observe)(next_state)
            c = jnp.mean(env.cost(obs, a, next_obs)) * gamma ** t
            return (next_state, acc + c), None

        (state, acc), _ = jax.lax.scan(
            step, (init_states, 0.0), jnp.arange(T, dtype=jnp.float32))
        return acc

    return oracle


def collect_episodes_on_device(env: JaxEnv, policy: GaussianMLPPolicy,
                               policy_params: dict,
                               diff_weights: Optional[np.ndarray],
                               exploration: ExplorationParams,
                               sample_size: int, max_timestep: int, key,
                               collector=None):
    """Host wrapper matching collect_real_rollouts' return contract:
    (Os, As, Rs, info-dict-ish tuple fields used by the orchestrator)."""
    from metrpo_tpu.collect import CollectInfo

    n_episodes = max(int(np.ceil(sample_size / max_timestep)), 1)
    if collector is None:
        collector = make_device_collector(env, policy, exploration, max_timestep)
    flat_dim = tree_flatten_vector(policy_params).shape[0]
    if diff_weights is None:
        dw = jnp.zeros((flat_dim,))
    else:
        dw = jnp.asarray(diff_weights, jnp.float32)
    obs, acts, rewards, next_obs, wc = collector(policy_params, dw, key,
                                                 n_episodes)
    obs, acts, rewards, next_obs = map(np.asarray, (obs, acts, rewards, next_obs))
    Os, As, Rs = [], [], []
    for i in range(n_episodes):
        full_o = np.concatenate([obs[i], next_obs[i, -1:]], axis=0)
        Os.append(full_o)
        As.append(acts[i])
        Rs.append(rewards[i])
    ep_rewards = rewards.sum(axis=1)
    info = CollectInfo(
        episodes=n_episodes, timesteps=n_episodes * max_timestep,
        avg_eps_reward=float(ep_rewards.mean()),
        min_eps_reward=float(ep_rewards.min()),
        max_eps_reward=float(ep_rewards.max()),
        avg_weight_change=float(wc))
    return Os, As, Rs, info
