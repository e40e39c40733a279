"""MuJoCo env family registry."""

from __future__ import annotations


def get_mujoco_env(name: str, seed: int = 0):
    name = name.replace("_", "-").lower()
    if name == "swimmer":
        from metrpo_tpu.envs.mujoco.locomotion import SwimmerEnv
        return SwimmerEnv(seed)
    if name == "snake":
        from metrpo_tpu.envs.mujoco.locomotion import SnakeEnv
        return SnakeEnv(seed)
    if name == "half-cheetah":
        from metrpo_tpu.envs.mujoco.locomotion import HalfCheetahEnv
        return HalfCheetahEnv(seed)
    if name == "hopper":
        from metrpo_tpu.envs.mujoco.locomotion import HopperEnv
        return HopperEnv(seed)
    if name == "ant":
        from metrpo_tpu.envs.mujoco.locomotion import AntEnv
        return AntEnv(seed)
    if name in ("humanoid",):
        from metrpo_tpu.envs.mujoco.manipulation import HumanoidEnv
        return HumanoidEnv(seed)
    if name in ("simple-humanoid",):
        from metrpo_tpu.envs.mujoco.manipulation import SimpleHumanoidEnv
        return SimpleHumanoidEnv(seed)
    if name == "reacher":
        from metrpo_tpu.envs.mujoco.manipulation import ReacherEnv
        return ReacherEnv(seed)
    if name in ("walker", "walker2d"):
        from metrpo_tpu.envs.mujoco.manipulation import Walker2dEnv
        return Walker2dEnv(seed)
    raise KeyError(f"Unknown mujoco env {name!r}")
