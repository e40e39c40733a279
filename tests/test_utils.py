"""Core substrate tests: replay FIFO semantics, streaming stats exactness,
config merge — promotions of the reference's inline self-checks
(utils.py:145-175, running_mean_std.py:44-61, utils.py:334-364)."""

import numpy as np
import pytest

from metrpo_tpu.config import (StopCriterion, config_from_dict, load_config,
                               update_dictionary)
from metrpo_tpu.utils.normalizer import (running_stats_init,
                                         running_stats_update)
from metrpo_tpu.utils.replay import ReplayDataset, combine_replay_datasets


def test_replay_fifo_eviction():
    dc = ReplayDataset(3)
    x = np.array([[1, 2], [3, 4], [5, 6], [7, 8]])
    dc.set_data(x, x)
    assert len(dc) == 3
    # Oldest row evicted.
    np.testing.assert_array_equal(dc.x, x[1:])


def test_replay_next_batch_wraparound():
    dc = ReplayDataset(10)
    x = np.arange(10)[:, None]
    dc.set_data(x, x)
    b1, _ = dc.get_next_batch(6)
    b2, _ = dc.get_next_batch(6)  # wraps: 6..9 then 0..1
    np.testing.assert_array_equal(b1.ravel(), np.arange(6))
    np.testing.assert_array_equal(b2.ravel(), [6, 7, 8, 9, 0, 1])
    b3, _ = dc.get_next_batch(4)
    np.testing.assert_array_equal(b3.ravel(), [2, 3, 4, 5])


def test_replay_add_data_points_cursor_at_new():
    dc = ReplayDataset(100)
    x = np.arange(4)[:, None]
    dc.set_data(x, x)
    dc.add_data(np.array([[9]]), np.array([[9]]))
    b, _ = dc.get_next_batch(1)
    assert b[0, 0] == 9  # cursor points at newly added data


def test_replay_sample_shapes():
    dc = ReplayDataset(100)
    x = np.random.randn(50, 3)
    y = np.random.randn(50, 2)
    dc.set_data(x, y)
    bx, by = dc.sample(17)
    assert bx.shape == (17, 3) and by.shape == (17, 2)


def test_combine_replay():
    a = ReplayDataset(10)
    xa = np.reshape(np.arange(20), (10, 2))
    a.set_data(xa, xa)
    b = ReplayDataset(5)
    xb = np.reshape(-np.arange(10), (5, 2))
    b.set_data(xb, xb)
    out = combine_replay_datasets(a, b)
    assert out.max_size == 10
    assert len(out) == 10  # capped


def test_running_stats_match_batch():
    # Streaming mean/std == batch mean/std (reference running_mean_std.py:44-61)
    means, stds = [2.0, 1.0], [1.0, 3.0]
    x = np.random.randn(1000, 3) * stds[0] + means[0]
    y = np.random.randn(1000, 3) * stds[1] + means[1]
    z = np.concatenate([x, y], axis=0)
    stats = running_stats_init(3, epsilon=0.0)
    stats = running_stats_update(stats, x)
    stats = running_stats_update(stats, y)
    np.testing.assert_allclose(np.asarray(stats.mean), z.mean(axis=0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.std), z.std(axis=0), rtol=1e-4)


def test_running_stats_std_floor():
    stats = running_stats_init(2, epsilon=0.0)
    stats = running_stats_update(stats, np.ones((100, 2)))
    # zero variance -> floored at sqrt(1e-2) = 0.1
    np.testing.assert_allclose(np.asarray(stats.std), 0.1)


def test_update_dictionary_recursive_merge():
    old = {"a": {"x": 1, "y": 2}, "b": 3}
    update_dictionary(old, {"a": {"x": 10}, "b": 4})
    assert old == {"a": {"x": 10, "y": 2}, "b": 4}


def test_update_dictionary_strict_rejects_unknown():
    with pytest.raises(KeyError):
        update_dictionary({"a": 1}, {"zzz": 2}, strict=True)


def test_stop_criterion_scalar_and_vector():
    sc = StopCriterion(threshold=0.1, offset=1e-5, percent_models_threshold=0.3)
    assert sc.scalar(1.0, 1.2)
    assert not sc.scalar(1.0, 1.05)
    old = np.array([1.0, 1.0, 1.0, 1.0, 1.0])
    # 2/5 = 0.4 > 0.3 -> stop
    assert sc.vector(old, np.array([1.1, 1.1, 0.9, 0.9, 0.9]))
    # 1/5 = 0.2 <= 0.3 -> continue
    assert not sc.vector(old, np.array([1.1, 0.9, 0.9, 0.9, 0.9]))


def test_config_from_reference_style_dict():
    raw = {
        "algo": "bptt",
        "env": "point2D",
        "n_models": 5,
        "sample_size": 500,
        "sweep_iters": 50,
        "policy": {"hidden_layers": [16, 16], "output_nonlinearity": "tf.identity"},
        "dynamics_model": {
            "hidden_layers": [128, 128],
            "regularization": {"method": "tf.nn.l2_loss", "constant": 0.0},
            "nonlinearity": ["tf.nn.relu", "tf.nn.relu"],
            "prediction_type": "state_change",
        },
        "dynamics_opt_params": {
            "learning_rate": {"scratch": 1e-3, "refine": 1e-3},
            "batch_size": 100,
            "stop_critereon": {"offset": 1e-5, "threshold": 0.1},
        },
        "policy_opt_params": {
            "T": 10,
            "oracle_maxtimestep": 10,
            "batch_size": 8,
            "stop_critereon": {"offset": 1e-5, "threshold": 0.1,
                               "percent_models_threshold": 0.3},
            "trpo": {"init_std": 1.0, "step_size": 0.01},
        },
        "rollout_params": {"max_timestep": 10, "split_ratio": 0.3},
        "_comment_algo": ["dropped"],
    }
    cfg = config_from_dict(raw)
    assert cfg.algo == "bptt"
    assert cfg.policy.hidden_layers == (16, 16)
    assert cfg.dynamics_model.hidden_layers == (128, 128)
    assert cfg.policy_opt_params.T == 10
    assert cfg.policy_opt_params.stop_criterion.percent_models_threshold == 0.3


def test_config_horizon_assert():
    raw = {
        "policy_opt_params": {"T": 10, "oracle_maxtimestep": 20},
        "rollout_params": {"max_timestep": 10},
    }
    with pytest.raises(AssertionError):
        config_from_dict(raw)
