"""Real-environment data collection with exploration noise.

Re-design of the reference's sequential collector
(``env_helpers.py:352-454`` sample_trajectories + ``model_based_rl.py:758-857``
collect_data).  The reference pays one sess.run per env per step on a single
env; here a whole batch of episodes runs in parallel: one jitted policy
forward per step for ALL episodes (each with its OWN parameter-space
perturbation, vmapped over a stacked param pytree), host envs stepped as a
batch.  This is the only host<->device boundary in the system.

Exploration (reference ``env_helpers.py:37-59``, ``:392-407``):
  - parameter-space noise per episode: w += param_noise * |last sweep's
    weight update| * N(0,1) (per weight);
  - additive action noise per step: a += action_noise * N(0,1), with
    optional per-step U(0,1) scaling (``vary_trajectory_noise``);
  - actions clipped to bounds after noise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.config import ExplorationParams, RolloutParams
from metrpo_tpu.envs.base import HostEnv, VecHostEnv
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.normalizer import RunningStats, running_stats_update
from metrpo_tpu.utils.replay import ReplayDataset
from metrpo_tpu.utils.tree import tree_flatten_vector, tree_unflatten_vector


def make_act_batch_fn(policy: GaussianMLPPolicy, prefer_cpu: bool = False):
    """Jitted per-episode-params batched policy mean (build once and reuse
    — a fresh jit per collect call recompiles every sweep).

    ``prefer_cpu=True`` pins the per-step forward to the host CPU backend
    (see evaluate.make_act_fn): real-env stepping is a host loop, and a
    tunnel round trip per step would dominate the tiny policy MLP."""
    from metrpo_tpu.evaluate import make_pinned_fn
    return make_pinned_fn(
        lambda ps, o: jax.vmap(lambda p, ob: policy.mean(p, ob))(ps, o),
        prefer_cpu=prefer_cpu)


class CollectInfo(NamedTuple):
    """Summary of one collection call.

    ``avg_weight_change`` is the mean |perturbation| of the most recent
    full n_envs parameter-noise refresh — an approximation: it averages
    over all n_envs freshly drawn perturbations, including ones whose
    slot never runs an episode before the next refresh (the reference's
    per-episode scalar, env_helpers.py:50-59, has the same role)."""
    episodes: int
    timesteps: int
    avg_eps_reward: float
    min_eps_reward: float
    max_eps_reward: float
    avg_weight_change: float


def _perturbed_param_stack(policy_params: dict, diff_weights: Optional[np.ndarray],
                           param_noise: float, n: int, key) -> tuple[dict, float]:
    """Stack of n perturbed policy params (leading axis n).

    diff_weights is |new - old| flat policy weights from the last sweep
    (model_based_rl.py:700-701); until the first update it is None and no
    perturbation is applied (env_helpers.py:50-59).
    """
    flat = tree_flatten_vector(policy_params)
    if diff_weights is None or param_noise == 0.0:
        stacked = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (n,) + l.shape), policy_params)
        return stacked, 0.0
    dw = jnp.asarray(diff_weights, jnp.float32)
    noise = jax.random.normal(key, (n, flat.shape[0])) * dw * param_noise
    flats = flat[None, :] + noise

    def unflatten_one(f):
        return tree_unflatten_vector(f, policy_params)

    stacked = jax.vmap(unflatten_one)(flats)
    return stacked, float(jnp.mean(jnp.abs(noise)))


def collect_real_rollouts(env: HostEnv,
                          env_pool: VecHostEnv,
                          policy: GaussianMLPPolicy,
                          policy_params: dict,
                          diff_weights: Optional[np.ndarray],
                          exploration: ExplorationParams,
                          sample_size: int,
                          max_timestep: int,
                          key,
                          logger=None,
                          check_invariants: bool = True,
                          act_batch_fn=None):
    """Collect >= sample_size real transitions. Returns (Os, As, Rs, info):
    lists of per-episode arrays (obs has len T+1)."""
    if diff_weights is None:
        assert exploration.initial_param_std == 0.0

    act_batch = act_batch_fn if act_batch_fn is not None \
        else make_act_batch_fn(policy)

    Os, As, Rs = [], [], []
    total = 0
    sum_r, min_r, max_r = 0.0, np.inf, -np.inf
    avg_wc = 0.0
    n_envs = len(env_pool)
    bounds_lo, bounds_hi = env.action_space.bounds

    prepare = getattr(act_batch, "prepare", lambda t: t)
    policy_params = prepare(policy_params)
    key = prepare(key)

    # Auto-reset batch (reference vectorized_sampler.py semantics): a done
    # or length-T episode is finalized and its slot reset IMMEDIATELY, so
    # every batched step yields n_envs transitions.  The previous
    # round-structured loop idled dead slots until the whole batch died —
    # ~4x wasted physics + policy forwards on early-is_done envs (ant:
    # random-policy episodes last ~25 of T=100 steps).
    key, k_perturb = jax.random.split(key)
    param_stack, avg_wc = _perturbed_param_stack(
        policy_params, diff_weights, exploration.param_noise, n_envs, k_perturb)
    param_stack = prepare(param_stack)
    perturbing = diff_weights is not None and exploration.param_noise > 0.0
    obs = np.asarray(env_pool.reset_batch(), np.float32)
    ep_obs = [[o] for o in obs]
    ep_act = [[] for _ in range(n_envs)]
    ep_rew = [[] for _ in range(n_envs)]
    steps_in_ep = np.zeros(n_envs, dtype=np.int64)

    # NOTE: when `total` reaches sample_size the loop exits and any
    # in-flight partial episodes are discarded — only episode-boundary
    # data enters the replay, matching the reference (sample_trajectories
    # also stops at whole trajectories, env_helpers.py:352-454). The last
    # batched step's physics/policy work for unfinished slots is wasted.
    while total < sample_size:
        actions = np.asarray(act_batch(param_stack, obs))
        if exploration.vary_trajectory_noise:
            scale = np.random.uniform(size=(n_envs, 1))
        else:
            scale = 1.0
        actions = actions + exploration.action_noise * scale * \
            np.random.randn(*actions.shape)
        actions = np.clip(actions, bounds_lo, bounds_hi)
        next_obs, rewards, dones, _ = env_pool.step_batch(actions)
        dones = np.asarray(dones, dtype=bool)
        if check_invariants and env.has_analytic_done:
            # done flag must match the analytic is_done (env_helpers.py:410-411)
            analytic = env.is_done_np(obs, next_obs)
            assert np.array_equal(dones, analytic), \
                "env done disagrees with analytic is_done"
        obs = np.asarray(next_obs, np.float32).copy()
        finished = []
        for i in range(n_envs):
            ep_obs[i].append(next_obs[i])
            ep_act[i].append(actions[i])
            ep_rew[i].append(float(rewards[i]))
            steps_in_ep[i] += 1
            if dones[i] or steps_in_ep[i] >= max_timestep:
                finished.append(i)
        for i in finished:
            o = np.asarray(ep_obs[i])
            a = np.asarray(ep_act[i])
            r = np.asarray(ep_rew[i])
            if check_invariants:
                # reward == -analytic cost per episode (env_helpers.py:422-431)
                ep_cost = len(a) * env.cost_np(o[:-1], a, o[1:])
                assert abs(ep_cost + r.sum()) < 1e-2 * max(1.0, abs(ep_cost)), \
                    f"cost {ep_cost:.4f} != -reward {r.sum():.4f}"
            Os.append(o)
            As.append(a)
            Rs.append(r)
            total += len(a)
            ep_r = r.sum()
            sum_r += ep_r
            min_r, max_r = min(min_r, ep_r), max(max_r, ep_r)
            if logger:
                logger.info("%d steps, reward %.2f, avg_weight_change %.3f",
                            total, ep_r, avg_wc)
            # respawn the slot: fresh episode, fresh per-episode perturbation
            obs[i] = env_pool.envs[i].reset()
            ep_obs[i] = [obs[i].copy()]
            ep_act[i] = []
            ep_rew[i] = []
            steps_in_ep[i] = 0
        if finished and perturbing:
            key, k_perturb = jax.random.split(key)
            fresh, avg_wc = _perturbed_param_stack(
                policy_params, diff_weights, exploration.param_noise,
                n_envs, k_perturb)
            mask = np.zeros(n_envs, dtype=bool)
            mask[finished] = True
            param_stack = prepare(jax.tree_util.tree_map(
                lambda old, new: jnp.where(
                    jnp.asarray(mask).reshape((-1,) + (1,) * (new.ndim - 1)),
                    new, old),
                param_stack, fresh))

    info = CollectInfo(
        episodes=len(Os), timesteps=total,
        avg_eps_reward=sum_r / max(len(Os), 1),
        min_eps_reward=float(min_r), max_eps_reward=float(max_r),
        avg_weight_change=avg_wc,
    )
    return Os, As, Rs, info


def split_and_store(Os, As,
                    rollout_params: RolloutParams,
                    dynamics_data: dict[str, ReplayDataset],
                    dynamics_validation: dict[str, ReplayDataset],
                    input_stats: RunningStats,
                    diff_stats: RunningStats,
                    n_obs: int):
    """Split transitions into train/validation replay and update running
    stats (reference collect_data, model_based_rl.py:793-857).

    Returns (rollout_data, input_stats', diff_stats') where rollout_data is
    the per-trajectory triplet list used by SVG.
    """
    x_all, y_all, rollout_data = [], [], []
    for o, a in zip(Os, As):
        triplets = []
        for t in range(len(o) - 1):
            x_all.append(np.concatenate([o[t], a[t]]))
            y_all.append(o[t + 1])
            triplets.append((o[t], a[t], o[t + 1]))
        rollout_data.append(triplets)
    x_all = np.asarray(x_all)
    y_all = np.asarray(y_all)
    indices = np.arange(len(x_all))
    if rollout_params.splitting_mode == "triplet":
        np.random.shuffle(indices)
    else:
        assert rollout_params.splitting_mode == "trajectory"

    total = len(x_all)
    cur = 0
    for scope in dynamics_data:
        if rollout_params.use_same_dataset:
            n_val = round(rollout_params.split_ratio * total)
            dynamics_validation[scope].add_data(x_all[indices[:n_val]],
                                                y_all[indices[:n_val]])
            dynamics_data[scope].add_data(x_all[indices[n_val:]],
                                          y_all[indices[n_val:]])
            cur = total
            x_train = x_all[indices[n_val:]]
            y_train = y_all[indices[n_val:]]
            input_stats = running_stats_update(input_stats, x_train)
            diff_stats = running_stats_update(
                diff_stats, y_train - x_train[:, :n_obs])
        else:
            n_val = int(rollout_params.split_ratio * total / len(dynamics_data))
            dynamics_validation[scope].add_data(x_all[indices[cur:cur + n_val]],
                                                y_all[indices[cur:cur + n_val]])
            cur += n_val
            n_tr = int(total / len(dynamics_data) - n_val)
            dynamics_data[scope].add_data(x_all[indices[cur:cur + n_tr]],
                                          y_all[indices[cur:cur + n_tr]])
            x_train = x_all[indices[cur:cur + n_tr]]
            y_train = y_all[indices[cur:cur + n_tr]]
            input_stats = running_stats_update(input_stats, x_train)
            diff_stats = running_stats_update(
                diff_stats, y_train - x_train[:, :n_obs])
            cur += n_tr
    return rollout_data, input_stats, diff_stats
