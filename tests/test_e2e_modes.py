"""End-to-end coverage of remaining config surface: point-mass
(goal-conditioned, state_change_goal prediction), held-out-ensemble
stopping mode (second_estimated), eps_rand mixing."""

import copy

import numpy as np
import pytest

from metrpo_tpu.config import config_from_dict
from metrpo_tpu.envs.point_mass import PointMassEnv
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.orchestrator import Trainer
from tests.test_e2e_point2d import POINT2D_TINY


@pytest.mark.slow
def test_point_mass_goal_conditioned_e2e(tmp_path):
    np.random.seed(0)
    raw = copy.deepcopy(POINT2D_TINY)
    raw["env"] = "point-mass"
    raw["n_models"] = 2
    raw["dynamics_model"]["prediction_type"] = "state_change_goal"
    raw["dynamics_model"]["hidden_layers"] = [32, 32]
    raw["dynamics_opt_params"]["max_passes"] = 20
    raw["policy_opt_params"]["max_iters"] = 20
    cfg = config_from_dict(raw)
    trainer = Trainer(cfg, PointMassEnv(), PointMassEnv,
                      snapshot_dir=str(tmp_path))
    res = trainer.run_sweep()
    assert np.isfinite(res["real_current_validation_cost"])
    # the goal split must be wired through: ensemble sees n_goals=2
    assert trainer.ensemble.n_goals == 2
    assert trainer.ensemble.n_states == 4


@pytest.mark.slow
def test_second_estimated_mode_two_ensembles(tmp_path):
    """mode=second_estimated trains a held-out validation ensemble whose
    vote also gates policy optimization (model_based_rl.py:287-299)."""
    np.random.seed(0)
    raw = copy.deepcopy(POINT2D_TINY)
    raw["policy_opt_params"]["mode"] = "second_estimated"
    raw["policy_opt_params"]["max_iters"] = 15
    raw["dynamics_opt_params"]["max_passes"] = 15
    raw["sample_size"] = 120
    cfg = config_from_dict(raw)
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=str(tmp_path))
    assert set(trainer.scopes) == {"training_dynamics", "validation_dynamics"}
    res = trainer.run_sweep()
    mvc = res["policy_logs"]["min_validation_costs"]
    assert "estimated" in mvc and "second_estimated" in mvc


@pytest.mark.slow
def test_eps_rand_sam_mode_e2e(tmp_path):
    np.random.seed(0)
    raw = copy.deepcopy(POINT2D_TINY)
    raw["algo"] = "trpo"
    raw["policy_opt_params"]["sam_mode"] = "eps_rand"
    raw["policy_opt_params"]["max_iters"] = 6
    raw["dynamics_opt_params"]["max_passes"] = 10
    raw["sample_size"] = 100
    cfg = config_from_dict(raw)
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=str(tmp_path))
    res = trainer.run_sweep()
    assert np.isfinite(res["real_current_validation_cost"])
