"""One-off TPU experiment: scan-unroll sweep for the imagined-rollout loop.

At the headline workload (B=500, T=100, K=5 x 1024x1024) the scan step is
HBM-bound on ensemble-weight streaming; unrolling the scan body lets XLA
overlap step t+1's weight fetch with step t's compute. Prints steps/s per
(sam_mode, unroll) pair. Run alone on the TPU (exclusive chip).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from metrpo_tpu.imagine import rollout_trajectories

B, T = 500, 100


def time_roll(policy, ensemble, pp, ep, ins, dfs, mode, unroll, n_iters=10):
    roll = jax.jit(lambda pp, ep, inits, key: rollout_trajectories(
        policy, ensemble, g._cheetah_cost, None, pp, ep, ins, dfs,
        inits, T, key, sam_mode=mode, unroll=unroll))
    rng = np.random.default_rng(0)
    inits = jnp.asarray(rng.normal(size=(B, 18)), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = roll(pp, ep, inits, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = roll(pp, ep, inits, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    return B * T / ((time.perf_counter() - t0) / n_iters)


def main():
    for dtype in ("float32", "bfloat16"):
        policy, ensemble, pp, ep, ins, dfs = g._build(dtype=dtype)
        for mode in ("step_rand_balanced", "step_rand"):
            for unroll in (1, 2, 4):
                sps = time_roll(policy, ensemble, pp, ep, ins, dfs, mode, unroll)
                print(f"{dtype} {mode} unroll={unroll}: {sps/1e6:.2f}M steps/s",
                      flush=True)


if __name__ == "__main__":
    main()
