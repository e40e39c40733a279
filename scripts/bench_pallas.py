"""Benchmark the VMEM-resident Pallas rollout kernel against the XLA scan
path on the real TPU, at the reference half-cheetah workload.

Run ONLY when no other process is using the chip (single exclusive TPU).

    python scripts/bench_pallas.py [block_size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main(block=128, T=100, hidden=1024, K=5):
    import __graft_entry__ as g
    from metrpo_tpu.imagine import rollout_trajectories
    from metrpo_tpu.ops.pallas.rollout import (RolloutSpec,
                                               build_resident_rollout,
                                               pack_inputs)

    B = K * block
    policy, ensemble, pp, ep, in_stats, diff_stats = g._build(
        n_models=K, dyn_hidden=(hidden, hidden))
    rng = np.random.default_rng(0)
    inits = rng.normal(size=(B, 18)).astype(np.float32)

    # --- XLA scan path (balanced mixing, same batch) ---
    roll = jax.jit(lambda pp, ep, i, k: rollout_trajectories(
        policy, ensemble, g._cheetah_cost, None, pp, ep, in_stats,
        diff_stats, i, T, k, sam_mode="step_rand_balanced"))
    out = roll(pp, ep, jnp.asarray(inits), jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(10):
        out = roll(pp, ep, jnp.asarray(inits), jax.random.fold_in(
            jax.random.PRNGKey(0), i))
    jax.block_until_ready(out)
    xla_dt = (time.perf_counter() - t0) / 10
    print(f"XLA scan:      {B * T / xla_dt / 1e6:8.2f}M steps/s "
          f"({xla_dt * 1e3:.2f} ms)")

    # --- Pallas resident-weights kernel ---
    spec = RolloutSpec(n_states=18, n_actions=6, hidden=hidden, n_models=K,
                       block=block, T=T, pol_hidden=32, vel_idx=9,
                       ctrl_coeff=0.05, reward_clip=10.0)
    call = build_resident_rollout(spec, interpret=False)
    packed = pack_inputs(spec, pp, ep, in_stats, diff_stats, inits, 0,
                         jax.random.PRNGKey(1))
    out = call(*packed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = call(*packed)
    jax.block_until_ready(out)
    pl_dt = (time.perf_counter() - t0) / 10
    print(f"Pallas kernel: {B * T / pl_dt / 1e6:8.2f}M steps/s "
          f"({pl_dt * 1e3:.2f} ms)  speedup x{xla_dt / pl_dt:.2f}")

    # sanity: outputs finite
    obs = np.asarray(out[0])
    assert np.isfinite(obs).all(), "kernel produced non-finite states"
    print("outputs finite ok; obs[0,0,:4] =", obs[0, 0, :4])


if __name__ == "__main__":
    blk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    main(block=blk)
