"""Interpret-mode semantics test for the VMEM-resident rollout kernel:
with noise disabled (logstd -> -inf) the kernel must reproduce an
independent step-by-step host simulation of the same block/roll member
assignment exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrpo_tpu.config import DynamicsModelParams, PolicyModelParams
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.ops.pallas.rollout import (RolloutSpec, build_resident_rollout,
                                           pack_inputs)
from metrpo_tpu.utils.normalizer import running_stats_init, running_stats_update

S, A, H, K, BLK, T = 18, 6, 64, 5, 16, 4


def _setup():
    policy = GaussianMLPPolicy.create(S, A, PolicyModelParams(hidden_layers=(32, 32)))
    ens = DynamicsEnsemble.create(S, A, 0, DynamicsModelParams(
        hidden_layers=(H, H), nonlinearity=("relu", "relu"),
        ignore_x_input=True), K)
    pp = policy.init(jax.random.PRNGKey(0))
    pp["logstd"] = jnp.full((A,), -30.0)  # noise off
    ep = ens.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    in_stats = running_stats_update(running_stats_init(S + A),
                                    rng.normal(size=(200, S + A)).astype(np.float32))
    diff_stats = running_stats_update(running_stats_init(S),
                                      0.1 * rng.normal(size=(200, S)).astype(np.float32))
    return policy, ens, pp, ep, in_stats, diff_stats


def test_resident_rollout_matches_host_simulation():
    policy, ens, pp, ep, in_stats, diff_stats = _setup()
    spec = RolloutSpec(n_states=S, n_actions=A, hidden=H, n_models=K,
                       block=BLK, T=T, pol_hidden=32, vel_idx=9,
                       ctrl_coeff=0.05, reward_clip=10.0)
    B = spec.batch
    rng = np.random.default_rng(1)
    inits = rng.normal(size=(B, S)).astype(np.float32)

    call = build_resident_rollout(spec, interpret=True)
    packed = pack_inputs(spec, pp, ep, in_stats, diff_stats, inits, 0,
                         jax.random.PRNGKey(2))
    shifts = np.asarray(packed[1])
    obs, acts, means, rews = call(*packed)
    obs = np.asarray(obs)[:, :, :S]
    acts = np.asarray(acts)[:, :, :A]
    rews = np.asarray(rews)[:, :, 0]

    # independent host simulation of the same semantics (bf16 weights)
    def bf16(x):
        return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)

    x = inits.copy()
    members = [jax.tree_util.tree_map(lambda l, k=k: l[k], ep) for k in range(K)]
    for t in range(T):
        a = np.asarray(policy.act(pp, jnp.asarray(x), clip=True))
        sh = int(shifts[t])
        xr = np.roll(x, sh, axis=0)   # pltpu.roll(x, s) == np.roll(x, s)
        ar = np.roll(a, sh, axis=0)
        nxt_r = np.zeros_like(xr)
        for m in range(K):
            rows = slice(m * BLK, (m + 1) * BLK)
            xgu = np.concatenate([xr[rows], ar[rows]], axis=1)
            # emulate bf16 member weights: quantize params like pack_inputs
            member_q = jax.tree_util.tree_map(
                lambda l: jnp.asarray(bf16(l)), members[m])
            pred = np.asarray(ens.apply_member(
                member_q, jnp.asarray(xgu), in_stats, diff_stats))
            nxt_r[rows] = pred
        x_next = np.roll(nxt_r, -sh, axis=0)
        reward = np.clip(
            x_next[:, 9] - 0.05 * np.sum(np.square(a), axis=1), -10, 10)

        np.testing.assert_allclose(obs[t], x, rtol=1e-3, atol=2e-3,
                                   err_msg=f"obs step {t}")
        np.testing.assert_allclose(acts[t], a, rtol=1e-3, atol=2e-3,
                                   err_msg=f"act step {t}")
        np.testing.assert_allclose(rews[t], reward, rtol=3e-2, atol=3e-3,
                                   err_msg=f"rew step {t}")
        x = x_next


def test_resident_rollout_noise_scale():
    """With logstd = log(0.5) the sampled actions' deviation from the mean
    must have std ~= 0.5 (Box-Muller correctness)."""
    policy, ens, pp, ep, in_stats, diff_stats = _setup()
    pp["logstd"] = jnp.full((A,), jnp.log(0.5))
    spec = RolloutSpec(n_states=S, n_actions=A, hidden=H, n_models=K,
                       block=64, T=2, pol_hidden=32, vel_idx=9,
                       ctrl_coeff=0.05, reward_clip=10.0)
    inits = np.zeros((spec.batch, S), np.float32)
    call = build_resident_rollout(spec, interpret=True)
    packed = pack_inputs(spec, pp, ep, in_stats, diff_stats, inits, 7,
                         jax.random.PRNGKey(3))
    obs, acts, means, rews = call(*packed)
    noise = np.asarray(acts)[:, :, :A] - np.asarray(means)[:, :, :A]
    # clip distorts the tails; use the interquartile range instead
    iqr = np.percentile(noise, 75) - np.percentile(noise, 25)
    approx_std = iqr / 1.349
    assert abs(approx_std - 0.5) < 0.08, approx_std
