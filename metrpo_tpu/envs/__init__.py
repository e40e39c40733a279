"""Env registry (reference env_helpers.py:13-33 get_env)."""

from __future__ import annotations

from metrpo_tpu.envs.base import AnalyticEnv, Box, HostEnv, JaxEnv, VecHostEnv


def get_env(env_name: str, seed: int = 0) -> AnalyticEnv:
    name = env_name.replace("_", "-").lower()
    if name == "point2d":
        from metrpo_tpu.envs.point2d import Point2DEnv
        return Point2DEnv(seed)
    if name == "point-mass":
        from metrpo_tpu.envs.point_mass import PointMassEnv
        return PointMassEnv(seed)
    if name in ("swimmer", "snake", "half-cheetah", "hopper", "ant",
                "humanoid", "simple-humanoid", "reacher", "walker", "walker2d"):
        from metrpo_tpu.envs.mujoco import get_mujoco_env
        return get_mujoco_env(name, seed)
    raise KeyError(f"Unknown env {env_name!r}")
