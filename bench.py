"""Headline benchmark: imagined env-steps/s/chip + TRPO update time on the
half-cheetah workload (BASELINE.json metric).

Workload = one ME-TRPO TRPO-phase iteration at reference scale
(params-half-cheetah.json): imagined transitions through a K=5 ensemble
of 1024x1024 MLPs with uniform-random member mixing per step, then the
full TRPO update (GAE + baseline fit + CG Fisher-vector products + line
search).

Variants measured:
  - step_rand fp32: reference-faithful semantics (iid uniform member per
    particle per step, env_helpers.py:617-620), all-K compute + select;
  - step_rand ragged fp32: SAME faithful semantics and member draws,
    executed as grouped matmuls (sort by member + jax.lax.ragged_dot,
    imagine.py) — B rows of MXU work instead of K*B. Measured round 3
    on v5e: does NOT beat all-K at B=500 (sort/gather latency) or
    B=8192 (weight-streaming-bound) — kept as a recorded strategy, not
    the default (BENCH_BUILDER_r03.json, RESULTS.md);
  - balanced fp32/bf16: optimized variant — uniform marginal member
    choice but exactly B/K particles per member per step (a different
    joint distribution from the reference's).
B=500 variants run with scan unroll=2 (the production default,
config.PolicyOptParams.rollout_unroll); B=8192 with unroll=1 (compute
per step is already long enough to overlap weight streaming).

HEADLINE (round 5+, VERDICT r4 next #6): ``value`` IS the STABLE point —
the reference-faithful step_rand variant at B=8192 (intra-run spread
<1%, round-over-round drift <1%). The B=500 point is latency-bound
tunnel-jitter territory (±25% phantom drift across driver runs) and is
co-reported as ``value_B500_latency``, never the regression gate.
``regression_gate`` names the field consumers must compare across
rounds. 'balanced' is reported but never the headline (VERDICT r2
weak #3).

Each variant is timed in repeats; the reported number is the MEDIAN
repeat, with min/max spread in "timing".

Roofline grounding (VERDICT r4 next #5): per-variant
``roofline`` reports effective model-FLOP/s (semantic FLOPs of the
variant x measured steps/s) and the weight-streaming HBM floor
(ensemble+policy bytes fetched once per scan step x scan-steps/s),
against public v5e peaks (197 bf16 TFLOP/s, 819 GB/s HBM; fp32 matmuls
on TPU execute as bf16-pass MXU work at JAX default precision). This
grounds the perf claim in hardware utilization independently of the
estimated TF1.4 baseline below.

Baseline: the TF 1.4 reference steps its imagined env from Python — two
feed-dict session.run calls per step over a <=100-env batch
(env_helpers.py:597-635, samplers/vectorized_sampler.py:24-27). At ~3 ms
per step that is ~3.3e4 imagined env-steps/s; we use 3e4 steps/s as the
documented baseline estimate (the repo publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# mirror run.py: an externally-set JAX_COMPILATION_CACHE_DIR wins
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_metrpo")

BASELINE_STEPS_PER_SEC = 3.0e4
N_PARTICLES, T = 500, 100
N_REPEATS, N_ITERS = 5, 10
K_MODELS = 5
FAITHFUL = ("step_rand_fp32", "step_rand_ragged_fp32")
STABLE_HEADLINE = "step_rand_fp32_B8192"
# public v5e peaks used for utilization figures (see module docstring)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def param_stats(params, stacked=False):
    """(matmul FLOPs per forward pass, total param bytes) from a pytree.

    Weight matrices contribute 2*size FLOPs (2*in*out per matmul; for a
    (K, in, out) ensemble-stacked matrix that sums over all K members =
    the all-K per-particle cost). Biases/scalars contribute bytes only.
    ``stacked=True`` for ensemble pytrees whose leaves carry a leading K
    axis (weights ndim 3, biases ndim 2); plain policy pytrees have
    weights ndim 2, biases ndim 1.
    """
    matmul_ndim = 3 if stacked else 2
    flops = 0
    nbytes = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if not hasattr(leaf, "ndim"):
            continue
        nbytes += leaf.size * leaf.dtype.itemsize
        if leaf.ndim == matmul_ndim:
            flops += 2 * leaf.size
    return flops, nbytes


def variant_roofline(name, particle_steps_per_s, policy_flops, dyn_flops,
                     weight_bytes, k=K_MODELS):
    """Effective FLOP/s + weight-streaming HBM floor for one variant.

    - all-K step_rand computes every member per particle (policy +
      full-ensemble FLOPs); ragged/balanced compute one member per
      particle (1/K of the ensemble FLOPs).
    - ALL variants stream the full ensemble+policy weights from HBM
      once per scan step (the per-step floor the scan cannot avoid).
    """
    if particle_steps_per_s is None:
        return None
    batch = 8192 if name.endswith("_B8192") else N_PARTICLES
    all_k = name.startswith("step_rand") and "ragged" not in name
    per_particle = policy_flops + (dyn_flops if all_k else dyn_flops // k)
    eff_tflops = particle_steps_per_s * per_particle / 1e12
    scan_steps_per_s = particle_steps_per_s / batch
    weights_gbps = scan_steps_per_s * weight_bytes / 1e9
    return {
        "mflop_per_particle_step": round(per_particle / 1e6, 2),
        "eff_tflops": round(eff_tflops, 2),
        "pct_bf16_peak": round(100.0 * eff_tflops / PEAK_BF16_TFLOPS, 1),
        "weights_stream_gbps": round(weights_gbps, 2),
        "pct_hbm_peak_weights": round(100.0 * weights_gbps / PEAK_HBM_GBPS, 1),
    }


def assemble_report(variants, timing, roofline, trpo_time, backend):
    """The one JSON object bench prints (factored out for schema tests).

    value = stable faithful B=8192 point; falls back to the fastest
    faithful B=500 variant if the stable point failed, and to null (with
    an explicit "error" field — ADVICE r4) if every faithful variant
    failed.
    """
    faithful_b500 = [variants[k] for k in FAITHFUL if variants.get(k)]
    b500_best = max(faithful_b500) if faithful_b500 else None
    stable = variants.get(STABLE_HEADLINE)
    value = stable if stable is not None else b500_best
    report = {
        "metric": "imagined_env_steps_per_sec_per_chip_half_cheetah",
        "value": value,
        "unit": "steps/s",
        "vs_baseline": (round(value / BASELINE_STEPS_PER_SEC, 2)
                        if value is not None else None),
        "regression_gate": "value_stable_B8192",
        "value_stable_B8192": stable,
        "value_B500_latency": b500_best,
        # the reference publishes no throughput numbers; the 3e4 steps/s
        # TF 1.4 figure is derived analytically (see module docstring)
        "baseline": "estimated",
        "headline_is": ("reference-faithful step_rand at B=8192 (stable "
                        "point); B500 co-reported as the latency point"),
        "variants": variants,
        "timing": timing,
        "roofline": roofline,
        "roofline_peaks_assumed": {"bf16_tflops": PEAK_BF16_TFLOPS,
                                   "hbm_gbps": PEAK_HBM_GBPS},
        "trpo_update_time_s": trpo_time,
        "n_particles": N_PARTICLES,
        "horizon": T,
        "n_models": K_MODELS,
        "backend": backend,
    }
    if value is None:
        report["error"] = "all faithful variants failed"
    if stable is None and b500_best is not None:
        report["headline_is"] = ("FALLBACK: stable B=8192 point failed; "
                                 "value is the faithful B=500 point")
    return report


def time_rollout(policy, ensemble, cost_fn, pp, ep, in_stats, diff_stats,
                 sam_mode, n_iters=N_ITERS, n_particles=None, unroll=2,
                 n_repeats=N_REPEATS, step_rand_impl="all_k"):
    """Median per-iteration time over n_repeats timing repeats (+ spread)."""
    from metrpo_tpu.imagine import rollout_trajectories

    B = n_particles or N_PARTICLES
    roll = jax.jit(lambda pp, ep, inits, key: rollout_trajectories(
        policy, ensemble, cost_fn, None, pp, ep, in_stats, diff_stats,
        inits, T, key, sam_mode=sam_mode, unroll=unroll,
        step_rand_impl=step_rand_impl))
    rng = np.random.default_rng(0)
    inits = jnp.asarray(rng.normal(size=(B, 18)), jnp.float32)
    key = jax.random.PRNGKey(0)
    batch = roll(pp, ep, inits, key)
    jax.block_until_ready(batch)
    times = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        for i in range(n_iters):
            batch = roll(pp, ep, inits, jax.random.fold_in(key, r * 1000 + i))
        jax.block_until_ready(batch)
        times.append((time.perf_counter() - t0) / n_iters)
    return float(np.median(times)), (min(times), max(times)), batch


def main():
    import __graft_entry__ as g
    from metrpo_tpu.algos.trpo import make_trpo_update
    from metrpo_tpu.config import TrpoParams

    variants, timing, roofline = {}, {}, {}
    builds = {
        "step_rand_fp32": ("float32", "step_rand", "all_k"),
        "step_rand_ragged_fp32": ("float32", "step_rand", "ragged"),
        "balanced_fp32": ("float32", "step_rand_balanced", "all_k"),
        "balanced_bf16": ("bfloat16", "step_rand_balanced", "all_k"),
    }
    batch = None
    for name, (dtype, mode, impl) in builds.items():
        policy, ensemble, pp, ep, in_stats, diff_stats = g._build(dtype=dtype)
        p_flops, p_bytes = param_stats(pp)
        d_flops, d_bytes = param_stats(ep, stacked=True)
        try:
            dt, spread, b = time_rollout(policy, ensemble, g._cheetah_cost,
                                         pp, ep, in_stats, diff_stats, mode,
                                         step_rand_impl=impl)
        except Exception as e:  # a variant must never kill the bench
            variants[name] = None
            timing[name] = f"failed: {type(e).__name__}"
            continue
        variants[name] = round(N_PARTICLES * T / dt, 1)
        timing[name] = {"steps_per_s_min": round(N_PARTICLES * T / spread[1], 1),
                        "steps_per_s_max": round(N_PARTICLES * T / spread[0], 1)}
        roofline[name] = variant_roofline(name, variants[name], p_flops,
                                          d_flops, p_bytes + d_bytes)
        if batch is None:
            batch = b
            pp0 = pp

    # large-batch points: same program, 8192 particles. unroll=1 here —
    # at B=8192 each step's compute is long enough to overlap the weight
    # streaming without unrolling, and unroll=2 doubles live VMEM buffers.
    # The FAITHFUL B=8192 point is the PRIMARY headline (intra-run
    # spread <1% vs ~5-25% at the latency-bound B=500).
    policy, ensemble, pp, ep, in_stats, diff_stats = g._build()
    p_flops, p_bytes = param_stats(pp)
    d_flops, d_bytes = param_stats(ep, stacked=True)
    for big_name, big_mode in (("step_rand_fp32_B8192", "step_rand"),
                               ("balanced_fp32_B8192", "step_rand_balanced")):
        try:
            dt_big, spread_big, _ = time_rollout(
                policy, ensemble, g._cheetah_cost, pp, ep, in_stats,
                diff_stats, big_mode, n_iters=5, n_particles=8192, unroll=1)
        except Exception as e:
            variants[big_name] = None
            timing[big_name] = f"failed: {type(e).__name__}"
            continue
        variants[big_name] = round(8192 * T / dt_big, 1)
        timing[big_name] = {
            "steps_per_s_min": round(8192 * T / spread_big[1], 1),
            "steps_per_s_max": round(8192 * T / spread_big[0], 1)}
        roofline[big_name] = variant_roofline(big_name, variants[big_name],
                                              p_flops, d_flops,
                                              p_bytes + d_bytes)

    if batch is not None:
        trpo_update = make_trpo_update(
            policy, TrpoParams(batch_size=N_PARTICLES * T))
        new_params, stats = trpo_update(pp0, batch)
        jax.block_until_ready(new_params)
        t0 = time.perf_counter()
        for _ in range(10):
            new_params, stats = trpo_update(pp0, batch)
        jax.block_until_ready(new_params)
        trpo_time = round((time.perf_counter() - t0) / 10, 4)
    else:
        trpo_time = None

    print(json.dumps(assemble_report(variants, timing, roofline, trpo_time,
                                     jax.default_backend())))


if __name__ == "__main__":
    main()
