"""bench.py JSON contract (VERDICT r4 next #5/#6 + ADVICE r4 null-value).

The driver parses bench.py's single JSON line; these tests pin the
schema without touching the TPU: headline = stable faithful B=8192
point, explicit regression_gate, B500 co-reported as the latency point,
an "error" field when every faithful variant failed, and the static
roofline arithmetic (model FLOPs / weight-stream bytes) used to ground
the perf claim in hardware utilization.
"""

import numpy as np

import bench


def _variants(**over):
    v = {"step_rand_fp32": 7.0e6, "step_rand_ragged_fp32": 6.0e6,
         "balanced_fp32": 7.2e6, "balanced_bf16": 9.0e6,
         "step_rand_fp32_B8192": 11.3e6, "balanced_fp32_B8192": 11.4e6}
    v.update(over)
    return v


def test_headline_is_stable_b8192_point():
    r = bench.assemble_report(_variants(), {}, {}, 0.004, "cpu")
    assert r["value"] == 11.3e6
    assert r["regression_gate"] == "value_stable_B8192"
    assert r["value_stable_B8192"] == 11.3e6
    assert r["value_B500_latency"] == 7.0e6  # fastest FAITHFUL, not balanced
    assert r["vs_baseline"] == round(11.3e6 / bench.BASELINE_STEPS_PER_SEC, 2)
    assert "error" not in r
    assert r["baseline"] == "estimated"


def test_headline_falls_back_to_b500_when_stable_fails():
    r = bench.assemble_report(_variants(step_rand_fp32_B8192=None), {}, {},
                              None, "cpu")
    assert r["value"] == 7.0e6
    assert r["value_stable_B8192"] is None
    assert "FALLBACK" in r["headline_is"]
    assert "error" not in r


def test_all_faithful_failed_reports_error_not_crash():
    v = _variants(step_rand_fp32=None, step_rand_ragged_fp32=None,
                  step_rand_fp32_B8192=None)
    r = bench.assemble_report(v, {}, {}, None, "cpu")
    assert r["value"] is None and r["vs_baseline"] is None
    assert r["error"] == "all faithful variants failed"
    # balanced numbers are still visible for the record
    assert r["variants"]["balanced_bf16"] == 9.0e6


def test_param_stats_counts_matmul_flops_and_bytes():
    stacked = {"w1": np.zeros((5, 24, 1024), np.float32),
               "b1": np.zeros((5, 1024), np.float32)}  # stacked bias != matmul
    flops, nbytes = bench.param_stats(stacked, stacked=True)
    assert flops == 2 * (5 * 24 * 1024)
    assert nbytes == 4 * (5 * 24 * 1024 + 5 * 1024)
    plain = {"w": np.zeros((1024, 18), np.float32),
             "b": np.zeros((18,), np.float32)}
    flops, nbytes = bench.param_stats(plain)
    assert flops == 2 * (1024 * 18)
    assert nbytes == 4 * (1024 * 18 + 18)


def test_variant_roofline_all_k_vs_grouped_factor():
    pf, df, wb = 1e5, 10.0e6, 22e6
    all_k = bench.variant_roofline("step_rand_fp32_B8192", 10e6, pf, df, wb)
    grouped = bench.variant_roofline("balanced_fp32_B8192", 10e6, pf, df, wb)
    ragged = bench.variant_roofline("step_rand_ragged_fp32", 500 * 100, pf,
                                    df, wb)
    assert all_k["eff_tflops"] == round(10e6 * (pf + df) / 1e12, 2)
    assert grouped["eff_tflops"] == round(10e6 * (pf + df / 5) / 1e12, 2)
    # ragged is faithful but computes one member per particle
    assert ragged["mflop_per_particle_step"] == round((pf + df / 5) / 1e6, 2)
    # weight streaming floor: bytes per scan step x scan steps/s
    assert all_k["weights_stream_gbps"] == round((10e6 / 8192) * wb / 1e9, 2)
    assert ragged["weights_stream_gbps"] == round(
        (500 * 100 / 500) * wb / 1e9, 2)
    assert bench.variant_roofline("step_rand_fp32", None, pf, df, wb) is None
