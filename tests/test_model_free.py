"""Model-free TRPO on Point2D must improve the return within a few
iterations (the reference BatchPolopt standalone train() capability)."""

import numpy as np

from metrpo_tpu.config import PolicyModelParams
from metrpo_tpu.envs.point2d import Point2DEnv


def test_model_free_trpo_point2d():
    np.random.seed(0)
    from metrpo_tpu.model_free import train_model_free
    env = Point2DEnv()
    params, curve = train_model_free(
        env, Point2DEnv, PolicyModelParams(hidden_layers=(16, 16)),
        algo="trpo", n_itr=8, batch_size=400, max_path_length=10,
        discount=1.0, seed=0)
    assert curve[-1] > curve[0], curve
