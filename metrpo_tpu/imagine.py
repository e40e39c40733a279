"""Imagination engine: on-device rollouts through the learned ensemble.

Replaces BOTH of the reference's imagined-rollout mechanisms with one
``lax.scan`` program:

  - the statically-unrolled T*K differentiable cost graph used by
    BPTT/L-BFGS/SVG (reference ``model_based_rl.py:106-151``) becomes
    ``bptt_costs`` — a scan over T vmapped over K members, O(1) program
    size instead of O(T*K) graph nodes;
  - the Python-stepped ``NeuralNetEnv``/``VecSimpleEnv`` TRPO sampler
    (reference ``env_helpers.py:532-635``), which crossed host<->device
    once per step, becomes ``rollout_trajectories`` — policy forward,
    ensemble forward, member mixing, reward, and termination all inside
    one jitted scan. This is where the 100x imagined-steps/s target is won
    (SURVEY.md hard part 6).

Member-mixing strategies (``sam_mode``, reference env_helpers.py:609-635):
step_rand (random member per step, default), eps_rand (per episode),
model_mean, model_mean_std, model_med, one_model.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.utils.normalizer import RunningStats

SAM_MODES = ("step_rand", "step_rand_balanced", "eps_rand", "model_mean",
             "model_mean_std", "model_med", "one_model")


def _precast_ens_params(ensemble: DynamicsEnsemble, ens_params: dict) -> dict:
    """Cast ensemble weights to the compute dtype ONCE, outside the scan.

    With fp32 masters and a bf16 compute dtype, the per-layer
    ``w.astype(bf16)`` inside ``mlp_apply`` would otherwise re-read the
    full fp32 weight set from HBM and write a bf16 copy on EVERY scan
    step — more bandwidth than the fp32 matmul it was meant to save.
    Pre-cast here makes the in-loop astype a no-op and halves the
    per-step weight streaming (the rollout loop is HBM-bandwidth-bound)."""
    if ensemble.dtype == jnp.float32:
        return ens_params
    return jax.tree_util.tree_map(
        lambda p: p.astype(ensemble.dtype), ens_params)


# ---------------------------------------------------------------------------
# Differentiable per-member rollout costs (BPTT / eval path)
# ---------------------------------------------------------------------------


def bptt_costs(policy: GaussianMLPPolicy,
               ensemble: DynamicsEnsemble,
               cost_fn: Callable,
               is_done_fn: Optional[Callable],
               cost_with_dones_fn: Optional[Callable],
               policy_params: dict,
               ens_params: dict,
               input_stats: RunningStats,
               diff_stats: RunningStats,
               init_states: jnp.ndarray,  # (B, S)
               T: int,
               gamma: float,
               stochastic: float = 0.0,
               key: Optional[jax.Array] = None,
               remat: bool = False) -> jnp.ndarray:
    """Per-member discounted rollout cost (K,), differentiable w.r.t.
    ``policy_params`` (and ``ens_params``).

    Semantics of reference ``build_policy_graph`` (model_based_rl.py:106-151):
    u = clip(policy(x) [+ noise]), x' = model_i([x, u]),
    cost += gamma^t * cost(x, u, x') with done masking for envs that define
    analytic termination (only Ant in the reference).
    """
    B = init_states.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    ens_params = _precast_ens_params(ensemble, ens_params)

    def member_cost(member_params):
        def step(carry, t):
            x, dones, acc, k = carry
            k, k_act = jax.random.split(k)
            u = policy.act(policy_params, x, key=k_act, stochastic=stochastic, clip=True)
            xgu = jnp.concatenate([x, u], axis=-1)
            x_next = ensemble.apply_member(member_params, xgu, input_stats, diff_stats)
            if is_done_fn is not None:
                # cost first, THEN update dones (model_based_rl.py:133-139)
                c = jnp.mean(cost_with_dones_fn(x, u, x_next, dones))
                dones = jnp.maximum(dones, is_done_fn(x, x_next).astype(jnp.float32))
            else:
                c = jnp.mean(cost_fn(x, u, x_next))
            acc = acc + (gamma ** t) * c
            return (x_next, dones, acc, k), None

        init = (init_states, jnp.zeros((B,)), 0.0, key)
        # remat: recompute per-step activations in the backward pass so the
        # T-step unroll's memory is O(1) in T instead of O(T) — needed for
        # T=200 x wide-ensemble BPTT (SURVEY.md §5.7 TPU-native equivalent).
        step_fn = jax.checkpoint(step) if remat else step
        (x, dones, acc, _), _ = jax.lax.scan(
            step_fn, init, jnp.arange(T, dtype=jnp.float32)
        )
        return acc

    return jax.vmap(member_cost)(ens_params)


# ---------------------------------------------------------------------------
# Trajectory generation (TRPO / VPG sampling path)
# ---------------------------------------------------------------------------


class ImaginedBatch(NamedTuple):
    """Fixed-shape trajectory batch: leading dims (n_particles, T)."""

    observations: jnp.ndarray   # (B, T, S)
    actions: jnp.ndarray        # (B, T, A)
    means: jnp.ndarray          # (B, T, A)   policy dist info at sample time
    logstds: jnp.ndarray        # (B, T, A)
    rewards: jnp.ndarray        # (B, T)
    valids: jnp.ndarray         # (B, T)  1.0 while the particle is alive


def _mix_members(preds: jnp.ndarray, sam_mode: str, member_idx: jnp.ndarray,
                 mix_eps: jnp.ndarray) -> jnp.ndarray:
    """preds: (K, B, S) -> (B, S) according to the mixing strategy.
    ``mix_eps`` is pre-drawn N(0,1) noise (used by model_mean_std only)."""
    K, B, S = preds.shape
    if sam_mode in ("step_rand", "eps_rand"):
        return jnp.take_along_axis(
            preds, member_idx[None, :, None].astype(jnp.int32), axis=0
        )[0]
    if sam_mode == "model_mean":
        return jnp.mean(preds, axis=0)
    if sam_mode == "model_mean_std":
        std = jnp.std(preds, axis=0)
        return jnp.mean(preds, axis=0) + mix_eps * std
    if sam_mode == "model_med":
        return jnp.median(preds, axis=0)
    if sam_mode == "one_model":
        return preds[0]
    raise ValueError(f"sam mode {sam_mode!r} is not defined.")


def rollout_trajectories(policy: GaussianMLPPolicy,
                         ensemble: DynamicsEnsemble,
                         cost_fn: Callable,
                         is_done_fn: Optional[Callable],
                         policy_params: dict,
                         ens_params: dict,
                         input_stats: RunningStats,
                         diff_stats: RunningStats,
                         init_states: jnp.ndarray,  # (B, S)
                         T: int,
                         key: jax.Array,
                         sam_mode: str = "step_rand",
                         deterministic: bool = False,
                         unroll: int = 1,
                         step_rand_impl: str = "all_k") -> ImaginedBatch:
    """Roll B particles T steps through the ensemble, all on device.

    Each step: sample a ~ N(policy_mean, std) (unless deterministic), clip,
    forward ALL K members on the batch, mix per ``sam_mode``, reward =
    -cost(x, a, x'), terminate on analytic done (validity mask — particles
    do not auto-reset mid-segment; fresh init states arrive each call).
    """
    B = init_states.shape[0]
    key, k_eps, k_act, k_member, k_mix = jax.random.split(key, 5)
    eps_member_idx = jax.random.randint(k_eps, (B,), 0, ensemble.n_models)
    ens_params = _precast_ens_params(ensemble, ens_params)

    K = ensemble.n_models
    balanced = sam_mode == "step_rand_balanced" and B % K == 0
    # 'ragged' executes the FAITHFUL step_rand semantics (iid uniform
    # member per particle per step — identical joint distribution, same
    # member draws from the same key) via grouped matmuls: sort particles
    # by sampled member, one jax.lax.ragged_dot per layer (B rows of MXU
    # work instead of K*B), unsort. The sorts/bincounts are hoisted out
    # of the scan like the balanced path's permutations.
    ragged = (sam_mode == "step_rand" and step_rand_impl == "ragged"
              and not ensemble.use_logit_weights and B >= K)

    # Hoist ALL per-step randomness out of the sequential scan: threefry
    # key-splits, normal draws, and especially the permutation sorts have
    # fixed per-call latency that dominates a 500-particle step (the
    # member matmuls are ~1 us; one on-device sort is tens of us). One
    # batched draw covering all T steps keeps the scan body to matmuls +
    # gathers + cost arithmetic.
    A = ensemble.n_actions
    act_noise = (jnp.zeros((T, B, A)) if deterministic
                 else jax.random.normal(k_act, (T, B, A)))
    if balanced:
        # (T, B) random permutations + inverses via two batched argsorts
        # over T*B elements, instead of 2*T sequential B-element sorts.
        u = jax.random.uniform(k_member, (T, B))
        perms = jnp.argsort(u, axis=-1)
        member_xs = (perms, jnp.argsort(perms, axis=-1))
    elif ragged:
        member_idx = jax.random.randint(k_member, (T, B), 0, K)
        perms = jnp.argsort(member_idx, axis=-1)
        member_sorted = jnp.take_along_axis(member_idx, perms, axis=-1)
        group_sizes = jax.vmap(
            lambda m: jnp.bincount(m, length=K))(member_idx).astype(jnp.int32)
        member_xs = (perms, jnp.argsort(perms, axis=-1), member_sorted,
                     group_sizes)
    elif sam_mode in ("step_rand", "step_rand_balanced"):
        member_xs = jax.random.randint(k_member, (T, B), 0, K)
    else:
        member_xs = jnp.zeros((T, 1), jnp.int32)  # unused placeholder
    mix_noise = (jax.random.normal(k_mix, (T, B, ensemble.n_obs))
                 if sam_mode == "model_mean_std" else jnp.zeros((T, 1, 1)))

    def step(carry, xs):
        x, alive, eps_idx = carry
        eps_a, member_x, mix_eps = xs
        mean, logstd = policy.dist(policy_params, x)
        a = mean + eps_a * jnp.exp(logstd)
        a_clip = jnp.clip(a, policy.action_low, policy.action_high)
        xgu = jnp.concatenate([x, a_clip], axis=-1)
        if balanced:
            # Balanced member assignment: permute particles and give each
            # member one contiguous block — every particle still gets a
            # uniformly-random member each step (marginally identical to
            # step_rand, sampled without replacement across the batch) but
            # each member runs on B/K rows instead of all B: K x fewer
            # FLOPs in the hot loop.
            perm, inv = member_x
            xgu_blocks = xgu[perm].reshape(K, B // K, -1)
            preds = ensemble.apply_batched(ens_params, xgu_blocks,
                                           input_stats, diff_stats)
            x_next = preds.reshape(B, -1)[inv]
        elif ragged:
            perm, inv, member_sorted, gs = member_x
            preds_sorted = ensemble.apply_ragged(
                ens_params, xgu[perm], gs, member_sorted,
                input_stats, diff_stats)
            x_next = preds_sorted[inv]
        else:
            preds = ensemble.apply_all(ens_params, xgu, input_stats, diff_stats)
            if sam_mode in ("step_rand", "step_rand_balanced"):
                member_idx = member_x
                mix_mode = "step_rand"
            else:
                member_idx = eps_idx
                mix_mode = sam_mode
            x_next = _mix_members(preds, mix_mode, member_idx, mix_eps)
        reward = -cost_fn(x, a_clip, x_next)
        if is_done_fn is not None:
            done = is_done_fn(x, x_next).astype(jnp.float32)
        else:
            done = jnp.zeros((B,))
        valid = alive
        alive = alive * (1.0 - done)
        out = (x, a, mean, logstd, reward, valid)
        return (x_next, alive, eps_idx), out

    init = (init_states, jnp.ones((B,)), eps_member_idx)
    _, (obs, acts, means, logstds, rewards, valids) = jax.lax.scan(
        step, init, (act_noise, member_xs, mix_noise), unroll=unroll)

    # scan stacks on axis 0 (time); transpose to (B, T, ...)
    tr = lambda x: jnp.swapaxes(x, 0, 1)
    return ImaginedBatch(
        observations=tr(obs), actions=tr(acts), means=tr(means),
        logstds=tr(logstds), rewards=tr(rewards), valids=tr(valids),
    )


# ---------------------------------------------------------------------------
# Open-loop model prediction (eval/diagnostics path)
# ---------------------------------------------------------------------------


def open_loop_rollout(policy: GaussianMLPPolicy,
                      ensemble: DynamicsEnsemble,
                      policy_params: dict,
                      member_params: dict,
                      input_stats: RunningStats,
                      diff_stats: RunningStats,
                      init_states: jnp.ndarray,
                      T: int) -> jnp.ndarray:
    """Deterministic single-member open-loop states (T+1, B, S) — used by the
    model-error diagnostics (reference env_helpers.py:96-172)."""

    def step(x, _):
        u = policy.act(policy_params, x, clip=True)
        xgu = jnp.concatenate([x, u], axis=-1)
        x_next = ensemble.apply_member(member_params, xgu, input_stats, diff_stats)
        return x_next, x

    last, xs = jax.lax.scan(step, init_states, None, length=T)
    return jnp.concatenate([xs, last[None]], axis=0)
