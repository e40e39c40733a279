"""Scaling harness: the PRODUCTION fused policy-opt program (rollout +
TRPO natural-gradient update, PolicyOptimizer._advance_chunk — the same
jitted program ``python -m metrpo_tpu.run`` executes every iteration) on
meshes of 1..N devices, reporting weak-scaling efficiency (imagined
steps/s per device, per-device work held constant).

On a real pod slice this measures the BASELINE.json multi-host target
(>=80% efficiency 1 -> N hosts):

    python scripts/bench_scaling.py --platform default

On the single-chip dev box the DEFAULT is N virtual CPU devices (the
JAX_PLATFORMS env var is overridden by the image's sitecustomize, so the
platform must be forced in-process before first jax use — and running on
the tunneled exclusive chip would contend with any live training job):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

_ap = argparse.ArgumentParser()
_ap.add_argument("--platform", default="cpu",
                 help="'cpu' (default, safe) or 'default' for the real "
                      "accelerator backend")
_ap.add_argument("--probe4", action="store_true",
                 help="probe the 4-device point: sweep particles/device and "
                      "the data-vs-ensemble mesh split (VERDICT r3 weak #5)")
_ARGS = _ap.parse_args()

import jax

if _ARGS.platform != "default":
    jax.config.update("jax_platforms", _ARGS.platform)

import numpy as np


class _CheetahCostEnv:
    """Minimal AnalyticEnv surface PolicyOptimizer needs (cost only)."""
    has_analytic_done = False

    def __init__(self, cost):
        self.cost = cost


def run_at(n_devices: int, per_dev_particles: int = 64, T: int = 25,
           dyn_hidden=(256, 256), iters_per_chunk: int = 2,
           reps: int = 3, n_ens: int = None):
    import __graft_entry__ as g
    from metrpo_tpu.config import PolicyOptParams, TrpoParams
    from metrpo_tpu.parallel.mesh import make_mesh, shard_tree_ensemble
    from metrpo_tpu.policy_opt import PolicyOptimizer

    if n_ens is None:
        n_ens = 2 if n_devices % 2 == 0 else 1
    n_models = max(2 * n_ens, 2)
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(n_devices // n_ens, n_ens, devices=devices)

    policy, ensemble, pp, ep, in_stats, diff_stats = g._build(
        n_models=n_models, dyn_hidden=dyn_hidden, pol_hidden=(32, 32))
    B = per_dev_particles * n_devices
    pop = PolicyOptParams(
        T=T, oracle_maxtimestep=T, batch_size=B, max_iters=iters_per_chunk,
        log_every=iters_per_chunk, sam_mode="step_rand",
        trpo=TrpoParams(batch_size=B * T, cg_iters=8, discount=1.0))

    rng = np.random.default_rng(0)
    sample_inits = lambda n: rng.normal(
        size=(n, g.CHEETAH_OBS)).astype(np.float32) * 0.1

    opt = PolicyOptimizer(
        "trpo", policy, ensemble, _CheetahCostEnv(g._cheetah_cost), pop,
        sample_init_states=sample_inits, oracle_eval=lambda p: 0.0,
        mesh=mesh)

    with mesh:
        ep_s = shard_tree_ensemble(mesh, ep)
        key = jax.random.PRNGKey(0)
        # warmup (compile)
        params, opt_state = pp, None
        params, opt_state, _, _ = opt._advance_chunk(
            params, opt_state, ep_s, in_stats, diff_stats, key,
            iters_per_chunk)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        t0 = time.perf_counter()
        for r in range(reps):
            key = jax.random.fold_in(key, r)
            params, opt_state, cost, _ = opt._advance_chunk(
                params, opt_state, ep_s, in_stats, diff_stats, key,
                iters_per_chunk)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        dt = (time.perf_counter() - t0) / reps
    steps = B * T * iters_per_chunk
    return {"devices": n_devices, "mesh": dict(mesh.shape),
            "particles": B, "per_dev_particles": per_dev_particles,
            "steps_per_s": steps / dt,
            "steps_per_s_per_device": steps / dt / n_devices,
            "chunk_s": dt}


def probe4():
    """The r2/r3 4-device point sat at ~71% weak-scaling efficiency with an
    untested attribution (virtual-device bandwidth sharing on a 2-core
    host).  Measure it: per-device particle counts x mesh splits, each
    normalized against the matching 1-device config."""
    out = []
    for per_dev in (64, 256):
        base = run_at(1, per_dev_particles=per_dev)
        base["weak_scaling_efficiency"] = 1.0
        out.append(base)
        for n_ens in (1, 2, 4):
            r = run_at(4, per_dev_particles=per_dev, n_ens=n_ens)
            r["weak_scaling_efficiency"] = (
                r["steps_per_s_per_device"] / base["steps_per_s_per_device"])
            out.append(r)
    print(json.dumps(out, indent=2, default=float))


def main():
    if _ARGS.probe4:
        probe4()
        return
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    results = [run_at(n) for n in sizes]
    base = results[0]["steps_per_s_per_device"]
    for r in results:
        r["weak_scaling_efficiency"] = r["steps_per_s_per_device"] / base
    print(json.dumps(results, indent=2, default=float))
    if len(results) > 1:
        eff = results[-1]["weak_scaling_efficiency"]
        print(f"# weak-scaling efficiency 1 -> {results[-1]['devices']} "
              f"devices: {eff:.2%} (target >= 80%)")


if __name__ == "__main__":
    main()
