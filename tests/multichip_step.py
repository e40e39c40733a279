"""TEST HARNESS (not a production API — VERDICT r4 next #8): a fused
dynamics-step + imagined-rollout + TRPO-update program used by
tests/test_parallel.py to prove that the COMPOSED inner iteration is
bitwise-stable under (data, ensemble) mesh partitioning — the sharded
run must reproduce the single-device metrics (same program, different
partitioning).

The PRODUCTION multi-chip path is the ordinary ``Trainer`` (its jitted
phases run under the same mesh via ``parallel/mesh.py`` shardings); that
path is what ``__graft_entry__.dryrun_multichip`` and the full-sweep
8dev==1dev equality test exercise. This module exists only so the
equality claim also covers a single fused program where the dynamics
Adam step (EP x DP), the particle scan (DP), and the TRPO
surrogate/KL/CG reductions (psum over ICI under GSPMD) compose inside
one jit.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from metrpo_tpu.algos.trpo import make_trpo_update
from metrpo_tpu.config import PolicyOptParams, TrpoParams
from metrpo_tpu.imagine import rollout_trajectories
from metrpo_tpu.models.dynamics import DynamicsEnsemble
from metrpo_tpu.models.policy import GaussianMLPPolicy
from metrpo_tpu.parallel.mesh import DATA_AXIS, ENSEMBLE_AXIS


def make_multichip_train_step(policy: GaussianMLPPolicy,
                              ensemble: DynamicsEnsemble,
                              cost_fn: Callable,
                              pop: PolicyOptParams,
                              mesh,
                              dyn_learning_rate: float = 1e-3):
    """Build the sharded full-step program.

    step(policy_params, ens_params, dyn_opt_state, dyn_x, dyn_y,
         input_stats, diff_stats, init_states, key)
      -> (policy_params', ens_params', dyn_opt_state', metrics dict)

    Shardings: dyn_x/dyn_y are (K, B, .) with K over 'ensemble' and B over
    'data'; init_states (P, S) with P over 'data'; params replicated except
    ensemble params' K axis over 'ensemble'.
    """
    dyn_opt = optax.adam(dyn_learning_rate)
    trpo_update = make_trpo_update(policy, pop.trpo)

    kbatch_spec = P(ENSEMBLE_AXIS, DATA_AXIS)
    particle_spec = P(DATA_AXIS)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    def step(policy_params, ens_params, dyn_opt_state, dyn_x, dyn_y,
             input_stats, diff_stats, init_states, key):
        # --- 1. dynamics ensemble step (EP x DP) ---
        dyn_x = constrain(dyn_x, kbatch_spec)
        dyn_y = constrain(dyn_y, kbatch_spec)

        def dyn_loss_fn(p):
            losses = ensemble.prediction_losses(p, dyn_x, dyn_y,
                                                input_stats, diff_stats)
            return jnp.sum(losses) + jnp.sum(ensemble.regularizer_losses(p))

        dyn_loss, grads = jax.value_and_grad(dyn_loss_fn)(ens_params)
        updates, dyn_opt_state = dyn_opt.update(grads, dyn_opt_state, ens_params)
        ens_params = optax.apply_updates(ens_params, updates)

        # --- 2. imagined rollout (particles over data axis) ---
        init_states = constrain(init_states, particle_spec)
        key, k_roll = jax.random.split(key)
        batch = rollout_trajectories(
            policy, ensemble, cost_fn, None, policy_params, ens_params,
            input_stats, diff_stats, init_states, pop.T, k_roll,
            sam_mode=pop.sam_mode, unroll=pop.rollout_unroll)
        batch = batch._replace(
            observations=constrain(batch.observations, P(DATA_AXIS)),
            rewards=constrain(batch.rewards, P(DATA_AXIS)),
        )

        # --- 3. TRPO natural-gradient update ---
        policy_params, stats = trpo_update(policy_params, batch)

        metrics = {
            "dyn_loss": dyn_loss,
            "surrogate_improvement":
                stats.surrogate_before - stats.surrogate_after,
            "kl": stats.kl,
            "mean_return": stats.mean_return,
            "step_accepted": stats.step_accepted,
        }
        return policy_params, ens_params, dyn_opt_state, metrics

    return jax.jit(step), dyn_opt
