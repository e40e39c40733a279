"""In-loop model-error diagnostics (VERDICT r4 next #7).

``model_diag_every`` wires evaluate.py's k-step open-loop error suite
and horizon-end error distributions — kept importable-but-commented in
the reference loop (model_based_rl.py:622-635) — into Trainer.run_sweep
behind a config cadence. A host-env sweep with the flag on must drop
state_diff_<sweep>.csv artifacts; on-device (JaxEnv) runtimes skip with
a warning instead of crashing.
"""

import copy
import os

import numpy as np
import pytest

from metrpo_tpu.config import config_from_dict
from metrpo_tpu.envs import get_env
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.orchestrator import Trainer
from tests.test_e2e_point2d import POINT2D_TINY

SWIMMER_TINY = {
    "algo": "trpo",
    "env": "swimmer",
    "n_models": 2,
    "sample_size": 60,
    "sweep_iters": 1,
    "seed": 0,
    "model_diag_every": 1,
    "policy": {"hidden_layers": [16, 16], "output_nonlinearity": "identity"},
    "dynamics_model": {
        "hidden_layers": [32, 32],
        "regularization": {"method": "l2", "constant": 0.0},
        "nonlinearity": ["relu", "relu"],
        "prediction_type": "state_change",
    },
    "dynamics_opt_params": {
        "learning_rate": {"scratch": 1e-3, "refine": 1e-3},
        "batch_size": 50,
        "max_passes": 10,
        "num_passes_threshold": 5,
        "log_every": 5,
        "sample_mode": "random",
        "reinitialize": False,
    },
    "policy_opt_params": {
        "mode": "estimated",
        "whole": True,
        "T": 12,
        "gamma": 1.0,
        "grad_norm_clipping": 10,
        "learning_rate": 1e-3,
        "log_every": 5,
        "num_iters_threshold": 5,
        "max_iters": 10,
        "oracle_maxtimestep": 12,
        "batch_size": 6,
        "sam_mode": "step_rand",
        "stop_critereon": {"offset": 1e-5, "threshold": 0.1,
                           "percent_models_threshold": 0.3},
        "trpo": {"init_std": 1.0, "step_size": 0.01, "batch_size": 72,
                 "reset": True, "discount": 1.0},
        "vpg": {"init_std": 1.0, "batch_size": 72, "reset": True},
    },
    "rollout_params": {
        "max_timestep": 12,
        "split_ratio": 0.3,
        "splitting_mode": "trajectory",
    },
}


def test_model_diag_every_parses_and_defaults_off():
    assert config_from_dict(copy.deepcopy(POINT2D_TINY)).model_diag_every == 0
    cfg = config_from_dict(copy.deepcopy(SWIMMER_TINY))
    assert cfg.model_diag_every == 1


@pytest.mark.slow
def test_model_diag_writes_artifacts_host_env(tmp_path):
    np.random.seed(0)
    cfg = config_from_dict(copy.deepcopy(SWIMMER_TINY))
    trainer = Trainer(cfg, get_env("swimmer"), lambda: get_env("swimmer"),
                      snapshot_dir=str(tmp_path))
    res = trainer.run_sweep()
    assert np.isfinite(res["real_current_validation_cost"])
    diag = tmp_path / "model_diag"
    assert (diag / "state_diff_1.csv").exists(), os.listdir(tmp_path)
    # horizon-end error-distribution histograms (get_error_distribution)
    assert (diag / "state_diff_dist_1.png").exists()
    assert (diag / "cost_diff_dist_1.png").exists()


@pytest.mark.slow
def test_model_diag_skips_on_device_runtime(tmp_path):
    """JaxEnv runs have no host pool: the flag warns + skips, never dies."""
    np.random.seed(0)
    raw = copy.deepcopy(POINT2D_TINY)
    raw["model_diag_every"] = 1
    raw["dynamics_opt_params"]["max_passes"] = 10
    raw["policy_opt_params"]["max_iters"] = 10
    cfg = config_from_dict(raw)
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=str(tmp_path))
    res = trainer.run_sweep()
    assert np.isfinite(res["real_current_validation_cost"])
    assert not (tmp_path / "model_diag").exists()
