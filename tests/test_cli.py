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
