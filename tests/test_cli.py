"""CLI parser + config round-trip tests (no training)."""

import json

import pytest

from metrpo_tpu.config import (config_from_dict, config_to_dict, load_config)
from metrpo_tpu.run import build_parser


def test_parser_accepts_all_algos():
    p = build_parser()
    for algo in ("trpo", "vpg", "bptt", "bptt-stochastic", "svg", "l-bfgs",
                 "ppo", "npg"):
        args = p.parse_args([algo, "-env", "point2D"])
        assert args.algo == algo


def test_parser_rejects_unknown_algo():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["ddpg", "-env", "point2D"])


def test_config_roundtrip(tmp_path):
    cfg = load_config("params/params-half-cheetah.json")
    blob = config_to_dict(cfg)
    # serialized config must be JSON-clean and re-loadable
    path = tmp_path / "params.json"
    path.write_text(json.dumps(blob))
    cfg2 = config_from_dict(json.loads(path.read_text()))
    assert cfg2.algo == cfg.algo
    assert cfg2.dynamics_model.hidden_layers == cfg.dynamics_model.hidden_layers
    assert cfg2.policy_opt_params.T == cfg.policy_opt_params.T
    assert cfg2.policy_opt_params.stop_criterion == cfg.policy_opt_params.stop_criterion


def test_all_param_files_roundtrip():
    import glob
    for p in sorted(glob.glob("params/*.json")):
        cfg = load_config(p)
        config_from_dict(config_to_dict(cfg))


@pytest.mark.slow
def test_parallel_seed_fleet(tmp_path):
    """-n N -parallel runs the seeds as concurrent processes (the in-tree
    analog of the reference's N EC2 instances,
    run_model_based_rl.py:147-169). Concurrency is proven by overlapping
    run windows (params.json written at start, progress.csv at end)."""
    import os
    import subprocess
    import sys

    replace = ("{'sweep_iters': 1, 'sample_size': 60, "
               "'dynamics_opt_params': {'max_passes': 4, "
               "'num_passes_threshold': 2}, "
               "'policy_opt_params': {'max_iters': 4, 'log_every': 2, "
               "'num_iters_threshold': 2}}")
    cmd = [sys.executable, "-m", "metrpo_tpu.run", "bptt", "-env", "point2D",
           "-platform", "cpu", "-n", "2", "-parallel", "-yes",
           "-replace", replace, "-snapshot-dir", str(tmp_path)]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    # children must not grab the 8-virtual-device flag's memory x2 — plain
    # single-device CPU is fine for this test
    env.pop("XLA_FLAGS", None)
    subprocess.run(cmd, check=True, env=env, timeout=600)

    windows = {}
    for seed in (0, 1):
        d = tmp_path / f"seed_{seed}"
        start = (d / "params.json").stat().st_mtime
        end = (d / "progress.csv").stat().st_mtime
        assert end > start
        with open(d / "progress.csv") as f:
            assert "real_current_validation_cost" in f.readline()
        windows[seed] = (start, end)
    (s0, e0), (s1, e1) = windows[0], windows[1]
    assert s0 < e1 and s1 < e0, f"seed runs did not overlap: {windows}"


def test_interactive_sweep_extension(tmp_path):
    """'Run 5 more sweeps?' prompt after training completes
    (model_based_rl.py:739-749): yes extends by the chunk and keeps the
    trainer state (count, replay) continuous; anything else stops."""
    from metrpo_tpu.config import config_from_dict
    from metrpo_tpu.envs.point2d import Point2DEnv
    from metrpo_tpu.orchestrator import Trainer
    from metrpo_tpu.train import maybe_extend_sweeps
    from tests.test_e2e_point2d import POINT2D_TINY

    cfg = config_from_dict(dict(POINT2D_TINY))
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv,
                      snapshot_dir=str(tmp_path))
    trainer.train(sweep_iters=1)
    assert trainer.count == 1

    answers = iter(["y", "no"])
    prompts = []

    def fake_input(msg):
        prompts.append(msg)
        return next(answers)

    extra = maybe_extend_sweeps(trainer, interactive=True, chunk=2,
                                input_fn=fake_input)
    assert extra == 2
    assert trainer.count == 3
    assert len(prompts) == 2 and "Run 2 more?" in prompts[0]
    # non-interactive: never prompts
    assert maybe_extend_sweeps(trainer, interactive=False,
                               input_fn=fake_input) == 0
    # EOF (piped stdin) stops cleanly
    def eof_input(msg):
        raise EOFError
    assert maybe_extend_sweeps(trainer, interactive=True,
                               input_fn=eof_input) == 0
