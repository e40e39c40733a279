"""Scaling harness: run the sharded full ME-TRPO train step on meshes of
1..N devices and report weak-scaling efficiency (imagined steps/s per
device with per-device work held constant).

On a real pod slice this measures the BASELINE.json multi-host target
(>=80% efficiency 1 -> N hosts). On the single-chip dev box it can run
against N virtual CPU devices to validate the harness:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def run_at(n_devices: int, per_dev_particles: int = 64, T: int = 20):
    import __graft_entry__ as g
    from metrpo_tpu.config import PolicyOptParams, TrpoParams
    from metrpo_tpu.parallel.mesh import (data_sharding,
                                          ensemble_batch_sharding, make_mesh,
                                          replicate_tree, shard_tree_ensemble)
    from metrpo_tpu.parallel.training import make_multichip_train_step

    n_ens = 2 if n_devices % 2 == 0 else 1
    n_models = max(2 * n_ens, 2)
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(n_devices // n_ens, n_ens, devices=devices)

    policy, ensemble, pp, ep, in_stats, diff_stats = g._build(
        n_models=n_models, dyn_hidden=(256, 256), pol_hidden=(32, 32))
    B = per_dev_particles * n_devices
    pop = PolicyOptParams(T=T, oracle_maxtimestep=T, batch_size=B,
                          trpo=TrpoParams(batch_size=B * T, cg_iters=5))
    step, dyn_opt = make_multichip_train_step(
        policy, ensemble, g._cheetah_cost, pop, mesh)

    rng = np.random.default_rng(0)
    D = g.CHEETAH_OBS + g.CHEETAH_ACT
    with mesh:
        ep_s = shard_tree_ensemble(mesh, ep)
        opt_state = dyn_opt.init(ep_s)
        dyn_x = jax.device_put(
            rng.normal(size=(n_models, 8 * (n_devices // n_ens), D)
                       ).astype(np.float32), ensemble_batch_sharding(mesh))
        dyn_y = jax.device_put(
            rng.normal(size=(n_models, 8 * (n_devices // n_ens),
                             g.CHEETAH_OBS)).astype(np.float32),
            ensemble_batch_sharding(mesh))
        inits = jax.device_put(
            rng.normal(size=(B, g.CHEETAH_OBS)).astype(np.float32),
            data_sharding(mesh))
        args = (replicate_tree(mesh, pp), ep_s, opt_state, dyn_x, dyn_y,
                replicate_tree(mesh, in_stats),
                replicate_tree(mesh, diff_stats), inits,
                jax.random.PRNGKey(0))
        out = step(*args)
        jax.block_until_ready(out[:3])
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out[:3])
        dt = (time.perf_counter() - t0) / 5
    return B * T / dt, dt


def main():
    n_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    results = {}
    base_per_dev = None
    for n in sizes:
        steps_s, dt = run_at(n)
        per_dev = steps_s / n
        if base_per_dev is None:
            base_per_dev = per_dev
        results[n] = {
            "steps_per_sec": round(steps_s, 1),
            "per_device": round(per_dev, 1),
            "efficiency": round(per_dev / base_per_dev, 3),
            "step_time_s": round(dt, 4),
        }
        print(json.dumps({"devices": n, **results[n]}))


if __name__ == "__main__":
    main()
