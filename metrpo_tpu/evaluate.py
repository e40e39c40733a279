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


def host_cpu_device():
    """The host CPU jax device, or None if unavailable."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def make_pinned_fn(fn, prefer_cpu: bool = False):
    """ONE cached jit of ``fn``, optionally pinned to the host CPU backend,
    for host-side per-step loops (eval, collect, model-free).

    Constructing ``jax.jit(lambda...)`` inside a loop would recompile on
    EVERY invocation — the jit cache is keyed by function identity.
    ``prefer_cpu=True`` targets the host CPU: the policy is a tiny 32x32
    MLP while the accelerator may sit behind a network tunnel, so a
    host-stepped env loop (one forward per env step) is dominated by
    dispatch round-trip latency, not compute. The returned fn exposes
    ``.prepare(params)`` to move the params to the target device ONCE per
    rollout instead of once per step (jit dispatches on the committed
    device of its arguments)."""
    cpu = host_cpu_device() if prefer_cpu else None
    jfn = jax.jit(fn)

    def wrapped(*args):
        return jfn(*args)

    wrapped.prepare = (lambda t: jax.device_put(t, cpu)) if cpu is not None \
        else (lambda t: t)
    return wrapped


def make_act_fn(policy: GaussianMLPPolicy, prefer_cpu: bool = False):
    """Shared jitted deterministic-act fn for host-side eval/collect loops
    (see make_pinned_fn for the caching/pinning rationale)."""
    return make_pinned_fn(lambda p, o: policy.act(p, o, clip=True),
                          prefer_cpu=prefer_cpu)


def evaluate_fixed_init_trajectories(env: HostEnv,
                                     env_pool: VecHostEnv,
                                     policy: GaussianMLPPolicy,
                                     policy_params: dict,
                                     reset_initial_states: np.ndarray,
                                     max_timestep: int,
                                     gamma: float = 1.0,
                                     check_invariants: bool = True,
                                     act_fn=None) -> float:
    """Deterministic real-env rollout cost from fixed reset states
    (reference env_helpers.py:476-504). Asserts cost ~= -reward."""
    n = len(reset_initial_states)
    assert len(env_pool) >= n, "env pool smaller than validation batch"
    pool = VecHostEnv(env_pool.envs[:n])
    observations = pool.reset_to_batch(reset_initial_states)
    dones = np.zeros(n, dtype=bool)
    cost, reward = 0.0, 0.0

    act = act_fn if act_fn is not None else make_act_fn(policy, prefer_cpu=True)
    if hasattr(act, "prepare"):
        policy_params = act.prepare(policy_params)
    for t in range(max_timestep):
        # numpy (uncommitted) obs + params committed to the act device:
        # the jitted program runs where the params live (host CPU when
        # prefer_cpu), avoiding a tunnel round trip per env step
        actions = np.asarray(act(policy_params, np.asarray(observations, np.float32)))
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


def record_episode_video(env: HostEnv,
                         policy: GaussianMLPPolicy,
                         policy_params: dict,
                         path: str,
                         max_timestep: int = 200,
                         fps: int = 30) -> Optional[str]:
    """Roll one deterministic episode and save an mp4 (the reference's gym
    video monitor equivalent). Returns the path, or None if the env can't
    render (pure-JAX envs)."""
    if not hasattr(env, "render_frame"):
        return None
    import imageio
    if path.endswith(".mp4"):
        # no ffmpeg backend in this image — fall back to gif
        path = path[: -len(".mp4")] + ".gif"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    act = jax.jit(lambda p, o: policy.act(p, o, clip=True))
    obs = env.reset()
    frames = [env.render_frame()]
    for _ in range(max_timestep):
        a = np.asarray(act(policy_params, jnp.asarray(obs[None], jnp.float32)))[0]
        obs, _, done, _ = env.step(a)
        frames.append(env.render_frame())
        if done:
            break
    imageio.mimsave(path, frames, fps=fps)
    return path


def get_error_distribution(env: HostEnv,
                           policy: GaussianMLPPolicy,
                           ensemble: DynamicsEnsemble,
                           policy_params: dict,
                           member_params: dict,
                           input_stats: RunningStats,
                           diff_stats: RunningStats,
                           horizon: int = 100,
                           sample_size: int = 50,
                           log_dir: Optional[str] = None,
                           count: int = 0,
                           logger=None,
                           is_plot: bool = False):
    """Horizon-end model-vs-real error distributions
    (reference env_helpers.py:175-269): roll the real env and the learned
    model from the same initial states with the same policy; report the
    total-cost difference and final-state L2 error, optionally as
    histogram PNGs."""
    act = jax.jit(lambda p, o: policy.act(p, o, clip=True))

    real_costs, initial_states, real_finals = [], [], []
    for _ in range(sample_size):
        x = env.reset()
        initial_states.append(x)
        total = 0.0
        for _t in range(horizon):
            a = np.asarray(act(policy_params, jnp.asarray(x[None], jnp.float32)))[0]
            x, r, done, _ = env.step(a)
            total -= r
            if done:
                break
        real_costs.append(total)
        real_finals.append(x)
    real_costs = np.asarray(real_costs)
    real_finals = np.asarray(real_finals)

    # model open-loop from the same initial states
    o = jnp.asarray(np.asarray(initial_states), jnp.float32)
    states = open_loop_rollout(policy, ensemble, policy_params, member_params,
                               input_stats, diff_stats, o, horizon)
    est_costs = np.zeros(sample_size)
    for t in range(horizon):
        x_t = np.asarray(states[t])
        x_n = np.asarray(states[t + 1])
        a = np.asarray(act(policy_params, jnp.asarray(x_t)))
        est_costs += env.cost_np_vec(x_t, a, x_n)
    final_est = np.asarray(states[-1])

    e_cost = est_costs - real_costs
    e_state = final_est - real_finals
    loss = np.sum(np.square(e_state), axis=1)
    if logger:
        logger.info("### Real cost ### mean %.3f std %.3f median %.3f",
                    real_costs.mean(), real_costs.std(), np.median(real_costs))
        logger.info("### Total cost difference ### mean %.3f std %.3f",
                    e_cost.mean(), e_cost.std())
        logger.info("### Final state error ### mean %.3f median %.3f",
                    loss.mean(), np.median(loss))
    if is_plot and log_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        os.makedirs(log_dir, exist_ok=True)
        for data, name in ((e_cost, "cost_diff"), (loss, "state_diff")):
            plt.figure()
            plt.hist(data, bins=20)
            plt.xlabel(name)
            plt.savefig(os.path.join(log_dir, f"{name}_dist_{count}.png"))
            plt.close()
    return e_cost, e_state


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
