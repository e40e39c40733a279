"""Evaluation & diagnostics suite.

Ports of the reference's oracles (``env_helpers.py:96-346, 456-504``):
  - ``evaluate_fixed_init_trajectories``: real-env deterministic rollout
    cost from fixed reset states (the stopping rule's 'real' oracle and
    the headline ``real_current_validation_cost`` metric);
  - ``evaluate_model_predictions``: k-step open-loop model error
    percentiles -> CSV rows;
  - ``estimate_policy_costs``: per-member imagined validation costs
    (feeds the ensemble-vote early-stopping rule).
"""

from __future__ import annotations

import csv
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.envs.base import HostEnv, VecHostEnv
from metrpo_tpu.imagine import bptt_costs, open_loop_rollout
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.normalizer import RunningStats


def evaluate_fixed_init_trajectories(env: HostEnv,
                                     env_pool: VecHostEnv,
                                     policy: GaussianMLPPolicy,
                                     policy_params: dict,
                                     reset_initial_states: np.ndarray,
                                     max_timestep: int,
                                     gamma: float = 1.0,
                                     check_invariants: bool = True) -> float:
    """Deterministic real-env rollout cost from fixed reset states
    (reference env_helpers.py:476-504). Asserts cost ~= -reward."""
    n = len(reset_initial_states)
    assert len(env_pool) >= n, "env pool smaller than validation batch"
    pool = VecHostEnv(env_pool.envs[:n])
    observations = pool.reset_to_batch(reset_initial_states)
    dones = np.zeros(n, dtype=bool)
    cost, reward = 0.0, 0.0

    act = jax.jit(lambda p, o: policy.act(p, o, clip=True))
    for t in range(max_timestep):
        actions = np.asarray(act(policy_params, jnp.asarray(observations, jnp.float32)))
        next_obs, _rewards, _dones, _ = pool.step_batch(actions)
        dones = np.logical_or(dones, _dones)
        rewards = (1.0 - dones) * _rewards * gamma ** t
        costs = (1.0 - dones) * env.cost_np_vec(observations, actions, next_obs) * gamma ** t
        observations = next_obs
        cost += float(np.mean(costs))
        reward += float(np.mean(rewards))
    if check_invariants:
        assert cost + reward < 1e-2 * max(1.0, abs(cost)), \
            f"oracle cost {cost:.4f} inconsistent with reward {reward:.4f}"
    return cost


def estimate_policy_costs(policy: GaussianMLPPolicy,
                          ensemble: DynamicsEnsemble,
                          cost_fn: Callable,
                          is_done_fn,
                          cost_with_dones_fn,
                          policy_params: dict,
                          ens_params: dict,
                          input_stats: RunningStats,
                          diff_stats: RunningStats,
                          validation_inits: jnp.ndarray,
                          T: int,
                          gamma: float) -> np.ndarray:
    """Per-member estimated validation cost (K,) on fixed init states —
    the reference's sess.run(policy_costs[scope]) at model_based_rl.py:1237-1248."""
    costs = bptt_costs(policy, ensemble, cost_fn, is_done_fn, cost_with_dones_fn,
                       policy_params, ens_params, input_stats, diff_stats,
                       jnp.asarray(validation_inits, jnp.float32), T, gamma,
                       stochastic=0.0)
    return np.asarray(costs)


def evaluate_model_predictions(env: HostEnv,
                               env_pool: VecHostEnv,
                               policy: GaussianMLPPolicy,
                               ensemble: DynamicsEnsemble,
                               policy_params: dict,
                               member_params: dict,
                               input_stats: RunningStats,
                               diff_stats: RunningStats,
                               reset_initial_states: np.ndarray,
                               max_timestep: int,
                               log_dir: Optional[str] = None,
                               count: int = 0,
                               timesteps=(1, 3, 5, 7, 10)) -> dict:
    """k-step open-loop state-error percentiles (env_helpers.py:96-172)."""
    # Real trajectories from the fixed reset states.
    n = len(reset_initial_states)
    pool = VecHostEnv(env_pool.envs[:n])
    obs = pool.reset_to_batch(reset_initial_states)
    act = jax.jit(lambda p, o: policy.act(p, o, clip=True))
    Os = [obs]
    for t in range(max_timestep):
        actions = np.asarray(act(policy_params, jnp.asarray(obs, jnp.float32)))
        obs, _, _, _ = pool.step_batch(actions)
        Os.append(obs)
    Os = np.asarray(Os)  # (T+1, n, S)

    # Model open-loop from every prefix state.
    percentiles = (0, 25, 50, 75, 100)
    errors = {"timesteps": list(timesteps), "l1_sum": [], "state_diff": {}}
    for p in percentiles:
        errors["state_diff"][f"{p}%"] = []
    errors["state_diff"]["avg"] = []
    for k in timesteps:
        if k > max_timestep:
            continue
        starts = Os[:-k].reshape(-1, Os.shape[-1])
        targets = Os[k:].reshape(-1, Os.shape[-1])
        pred = open_loop_rollout(policy, ensemble, policy_params, member_params,
                                 input_stats, diff_stats,
                                 jnp.asarray(starts, jnp.float32), k)
        final = np.asarray(pred[-1])
        diff = np.abs(targets - final)
        errors["l1_sum"].append(float(np.mean(np.sum(diff, axis=1))))
        for p in percentiles:
            errors["state_diff"][f"{p}%"].append(
                np.percentile(diff, p, axis=0).tolist())
        errors["state_diff"]["avg"].append(np.mean(diff, axis=0).tolist())

    if log_dir is not None:
        path = os.path.join(log_dir, f"state_diff_{count}.csv")
        os.makedirs(log_dir, exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            header = sorted(errors["state_diff"].keys())
            w.writerow(["timesteps"] + header)
            for i, ts in enumerate(errors["timesteps"][: len(errors["l1_sum"])]):
                w.writerow([ts] + [str(errors["state_diff"][h][i]) for h in header])
    return errors
