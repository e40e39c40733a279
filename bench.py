"""Headline benchmark: imagined env-steps/s/chip + TRPO update time on the
half-cheetah workload (BASELINE.json metric).

Workload = one ME-TRPO TRPO-phase iteration at reference scale
(params-half-cheetah.json): 50 000 imagined transitions per iteration as
500 particles x T=100 steps through a K=5 ensemble of 1024x1024 MLPs with
step_rand member mixing, then the full TRPO natural-gradient update
(GAE + baseline fit + CG on Fisher-vector products + line search).

Baseline: the TF 1.4 reference steps its imagined env from Python — two
feed-dict session.run calls per step over a <=100-env batch
(env_helpers.py:597-635, samplers/vectorized_sampler.py:24-27). At ~3 ms
per step that is ~3.3e4 imagined env-steps/s; we use 3e4 steps/s as the
documented baseline estimate (the repo publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC = 3.0e4


def main():
    import __graft_entry__ as g
    from metrpo_tpu.config import TrpoParams
    from metrpo_tpu.algos.trpo import make_trpo_update
    from metrpo_tpu.imagine import rollout_trajectories

    policy, ensemble, policy_params, ens_params, in_stats, diff_stats = g._build()
    cost_fn = g._cheetah_cost

    N_PARTICLES, T = 500, 100

    rollout = jax.jit(lambda pp, ep, inits, key: rollout_trajectories(
        policy, ensemble, cost_fn, None, pp, ep, in_stats, diff_stats,
        inits, T, key, sam_mode="step_rand"))
    trpo_update = make_trpo_update(policy, TrpoParams(batch_size=N_PARTICLES * T))

    rng = np.random.default_rng(0)
    inits = jnp.asarray(rng.normal(size=(N_PARTICLES, 18)), jnp.float32)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    batch = rollout(policy_params, ens_params, inits, key)
    jax.block_until_ready(batch)
    new_params, stats = trpo_update(policy_params, batch)
    jax.block_until_ready(new_params)

    # timed: imagined rollout
    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        batch = rollout(policy_params, ens_params, inits,
                        jax.random.fold_in(key, i))
    jax.block_until_ready(batch)
    rollout_time = (time.perf_counter() - t0) / n_iters
    steps_per_sec = N_PARTICLES * T / rollout_time

    # timed: TRPO update
    t0 = time.perf_counter()
    for i in range(n_iters):
        new_params, stats = trpo_update(policy_params, batch)
    jax.block_until_ready(new_params)
    trpo_time = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": "imagined_env_steps_per_sec_per_chip_half_cheetah",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "trpo_update_time_s": round(trpo_time, 4),
        "rollout_time_s": round(rollout_time, 4),
        "n_particles": N_PARTICLES,
        "horizon": T,
        "n_models": 5,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
