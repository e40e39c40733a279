"""Determinism + checkpoint/resume tests (the fixed-seed golden-run class
of checks the reference lacked, SURVEY.md §4 implication)."""

import copy

import jax
import numpy as np

from metrpo_tpu.config import config_from_dict
from metrpo_tpu.envs.point2d import Point2DEnv
from metrpo_tpu.orchestrator import Trainer
from metrpo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from tests.test_e2e_point2d import POINT2D_TINY


def _tiny_cfg():
    raw = copy.deepcopy(POINT2D_TINY)
    raw["dynamics_opt_params"]["max_passes"] = 10
    raw["policy_opt_params"]["max_iters"] = 10
    raw["sample_size"] = 100
    return config_from_dict(raw)


def _run_one_sweep(seed):
    np.random.seed(seed)
    cfg = _tiny_cfg()
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=None,
                      seed=seed)
    res = trainer.run_sweep()
    return res["real_current_validation_cost"], trainer


def test_fixed_seed_is_deterministic():
    c1, _ = _run_one_sweep(123)
    c2, _ = _run_one_sweep(123)
    assert c1 == c2, (c1, c2)


def test_different_seeds_differ():
    c1, _ = _run_one_sweep(123)
    c2, _ = _run_one_sweep(456)
    assert c1 != c2


def test_checkpoint_roundtrip(tmp_path):
    _, trainer = _run_one_sweep(7)
    path = str(tmp_path / "state.ckpt")
    save_checkpoint(path, trainer.state_dict())
    state = load_checkpoint(path)

    np.random.seed(7)
    fresh = Trainer(_tiny_cfg(), Point2DEnv(), Point2DEnv, snapshot_dir=None,
                    seed=7)
    fresh.load_state_dict(state)
    assert fresh.count == trainer.count
    a = jax.tree_util.tree_leaves(trainer.policy_params)
    b = jax.tree_util.tree_leaves(fresh.policy_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # the restored trainer must be able to continue training
    res = fresh.run_sweep()
    assert np.isfinite(res["real_current_validation_cost"])


def test_light_checkpoint_resume(tmp_path):
    """A replay-stripped ckpt (scripts/preserve_run.py) resumes via
    train()'s resume-light.ckpt fallback and keeps training — the
    cross-machine git-preserved resume path."""
    _, trainer = _run_one_sweep(11)
    state = trainer.state_dict()
    state.pop("replay", None)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    save_checkpoint(str(run_dir / "resume-light.ckpt"), state)

    from metrpo_tpu.train import train
    np.random.seed(11)
    resumed = train(_tiny_cfg(), snapshot_dir=str(run_dir),
                    sweep_iters=2, resume=True)
    # resumed at sweep 1 from the light ckpt, ran 1 more sweep
    assert resumed.count == 2
    assert np.isfinite(resumed.learning_curve[-1]
                       ["real_current_validation_cost"])
