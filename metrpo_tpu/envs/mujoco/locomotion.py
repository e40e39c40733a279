"""COM-observation locomotion envs: swimmer, snake, half-cheetah, hopper, ant.

Observation layouts, analytic costs, and termination rules are behavioral
ports of the reference's rllab-variant envs (``envs/com_swimmer_env.py``,
``com_snake_env.py``, ``com_half_cheetah_env.py``, ``com_hopper_env.py``,
``com_ant_env.py``); physics runs on modern MuJoCo models (gymnasium assets
for the standard morphologies, in-tree ``assets/snake.xml`` for the
5-link snake).  Each cost is ONE jnp function used by imagined rollouts
(differentiable) and host-side oracle checks alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metrpo_tpu.envs.mujoco.host_env import MujocoHostEnv


class SwimmerEnv(MujocoHostEnv):
    """Obs (10): torso COM xy, qpos[2:5], torso COM vel xy, qvel[2:5]
    (reference com_swimmer_env.py:53-61). Cost: -(comvel_x - c*mean(u^2))
    (:105-114)."""

    XML = "swimmer.xml"
    FRAME_SKIP = 4
    COM_AXES = (0, 1)
    VEL_AXES = (0, 1)
    ROOT_POS_IDX = (0, 1)
    ROOT_VEL_IDX = (0, 1)

    def __init__(self, seed: int = 0, ctrl_cost_coeff: float = 1e-2):
        self.ctrl_cost_coeff = ctrl_cost_coeff
        super().__init__(seed)

    def get_current_obs(self) -> np.ndarray:
        qpos, qvel = self.data.qpos, self.data.qvel
        return np.concatenate([
            self.body_com()[:2], qpos[2:5],
            self.body_comvel()[:2], qvel[2:5],
        ])

    def post_step(self, action):
        obs = self.get_current_obs()
        ctrl_cost = 0.5 * self.ctrl_cost_coeff * np.sum(
            np.square(np.clip(action, -1, 1)))
        reward = self.body_comvel()[0] - ctrl_cost
        return obs, float(reward), False, {}

    def batch_post_step(self, qpos, qvel, com, comvel, actions):
        """Vectorized post_step over native-extracted batch state
        (envs/base.VecHostEnv fast path; same formulas as post_step)."""
        obs = np.concatenate(
            [com[:, :2], qpos[:, 2:5], comvel[:, :2], qvel[:, 2:5]], axis=1)
        a = np.clip(actions, -1, 1)
        reward = comvel[:, 0] - 0.5 * self.ctrl_cost_coeff * np.sum(
            np.square(a), axis=1)
        return obs, reward, np.zeros(len(obs), bool)

    def cost(self, x, u, x_next):
        # NOTE: reference swimmer cost uses mean over action dims while its
        # env reward uses 0.5*sum — the reference keeps that asymmetry only
        # for swimmer (cost_np_vec, com_swimmer_env.py:112-114). We align
        # both on the env-reward form so cost == -reward holds exactly.
        return -(x_next[:, 5] - 0.5 * self.ctrl_cost_coeff *
                 jnp.sum(jnp.square(u), axis=1))


class SnakeEnv(MujocoHostEnv):
    """5-link snake. Obs (14): COM xy, qpos[2:], COM vel xy, qvel[2:]
    (reference com_snake_env.py:31-39); cost on forward COM vel at index 7
    (:73-84).  frame_skip=50 matches the reference XML's custom numeric
    (vendor/mujoco_models/snake.xml:4) read by rllab's MujocoEnv, giving
    the same 0.05 s control interval as timestep 0.001 x 50."""

    XML = "snake.xml"
    FRAME_SKIP = 50
    FWD_IDX = 7
    COM_AXES = (0, 1)
    VEL_AXES = (0, 1)
    ROOT_POS_IDX = (0, 1)
    ROOT_VEL_IDX = (0, 1)

    def __init__(self, seed: int = 0, ctrl_cost_coeff: float = 1e-2):
        self.ctrl_cost_coeff = ctrl_cost_coeff
        super().__init__(seed)

    def get_current_obs(self) -> np.ndarray:
        qpos, qvel = self.data.qpos, self.data.qvel
        return np.concatenate([
            self.body_com()[:2], qpos[2:],
            self.body_comvel()[:2], qvel[2:],
        ])

    def post_step(self, action):
        obs = self.get_current_obs()
        ctrl_cost = 0.5 * self.ctrl_cost_coeff * np.sum(
            np.square(np.clip(action, -1, 1)))
        reward = self.body_comvel()[0] - ctrl_cost
        return obs, float(reward), False, {}

    def batch_post_step(self, qpos, qvel, com, comvel, actions):
        obs = np.concatenate(
            [com[:, :2], qpos[:, 2:], comvel[:, :2], qvel[:, 2:]], axis=1)
        a = np.clip(actions, -1, 1)
        reward = comvel[:, 0] - 0.5 * self.ctrl_cost_coeff * np.sum(
            np.square(a), axis=1)
        return obs, reward, np.zeros(len(obs), bool)

    def cost(self, x, u, x_next):
        return -(x_next[:, self.FWD_IDX] -
                 0.5 * self.ctrl_cost_coeff * jnp.sum(jnp.square(u), axis=1))


class HalfCheetahEnv(MujocoHostEnv):
    """Obs (18): torso COM [x,z], qpos[2:], COM vel [x,z], qvel[2:]
    (reference com_half_cheetah_env.py:23-29). Reward clipped to [-10,10]
    (:47); cost on comvel index 9 (:63-75)."""

    XML = "half_cheetah.xml"
    FRAME_SKIP = 5
    COM_AXES = (0, 2)
    VEL_AXES = (0, 2)
    ROOT_POS_IDX = (0, 1)
    ROOT_VEL_IDX = (0, 1)

    def __init__(self, seed: int = 0):
        self.ctrl_cost_coeff = 1e-1
        super().__init__(seed)

    def get_current_obs(self) -> np.ndarray:
        qpos, qvel = self.data.qpos, self.data.qvel
        return np.concatenate([
            self.body_com()[[0, 2]], qpos[2:],
            self.body_comvel()[[0, 2]], qvel[2:],
        ])

    def post_step(self, action):
        obs = self.get_current_obs()
        action = np.clip(action, -1, 1)
        ctrl_cost = self.ctrl_cost_coeff * 0.5 * np.sum(np.square(action))
        reward = float(np.clip(self.body_comvel()[0] - ctrl_cost, -10, 10))
        return obs, reward, False, {}

    def batch_post_step(self, qpos, qvel, com, comvel, actions):
        obs = np.concatenate(
            [com[:, [0, 2]], qpos[:, 2:], comvel[:, [0, 2]], qvel[:, 2:]],
            axis=1)
        a = np.clip(actions, -1, 1)
        reward = np.clip(
            comvel[:, 0] - self.ctrl_cost_coeff * 0.5 * np.sum(
                np.square(a), axis=1), -10, 10)
        return obs, reward, np.zeros(len(obs), bool)

    def cost(self, x, u, x_next):
        return -jnp.clip(
            x_next[:, 9] - self.ctrl_cost_coeff * 0.5 * jnp.sum(jnp.square(u), axis=1),
            -10.0, 10.0)


class HopperEnv(MujocoHostEnv):
    """Obs (11): torso COM z, qpos[2:], COM vel [x,z], qvel[2:]
    (reference com_hopper_env.py:43-49). Shaped alive cost (:83-104)."""

    XML = "hopper.xml"
    FRAME_SKIP = 5
    # obs carries only COM z (rootx is unobserved -> reconstructed at 0,
    # dynamics are x-translation invariant) but BOTH comvel x and z
    COM_AXES = (2,)
    VEL_AXES = (0, 2)
    ROOT_POS_IDX = (1,)
    ROOT_VEL_IDX = (0, 1)

    def __init__(self, seed: int = 0, alive_coeff: float = 1.0,
                 ctrl_cost_coeff: float = 0.01):
        self.alive_coeff = alive_coeff
        self.ctrl_cost_coeff = ctrl_cost_coeff
        super().__init__(seed)

    def get_current_obs(self) -> np.ndarray:
        qpos, qvel = self.data.qpos, self.data.qvel
        return np.concatenate([
            self.body_com()[2:3], qpos[2:],
            self.body_comvel()[[0, 2]], qvel[2:],
        ])

    def post_step(self, action):
        obs = self.get_current_obs()
        action = np.clip(action, -1, 1)
        vel, height, ang = obs[5], obs[0], obs[1]
        reward = vel - \
            0.5 * self.ctrl_cost_coeff * np.sum(np.square(action)) - \
            np.sum(np.maximum(np.abs(obs[2:]) - 100, 0)) - \
            10 * np.maximum(0.45 - height, 0) - \
            10 * np.maximum(abs(ang) - 0.2, 0)
        return obs, float(reward), False, {}

    def batch_post_step(self, qpos, qvel, com, comvel, actions):
        obs = np.concatenate(
            [com[:, 2:3], qpos[:, 2:], comvel[:, [0, 2]], qvel[:, 2:]],
            axis=1)
        a = np.clip(actions, -1, 1)
        vel, height, ang = obs[:, 5], obs[:, 0], obs[:, 1]
        reward = vel - \
            0.5 * self.ctrl_cost_coeff * np.sum(np.square(a), axis=1) - \
            np.sum(np.maximum(np.abs(obs[:, 2:]) - 100, 0), axis=1) - \
            10 * np.maximum(0.45 - height, 0) - \
            10 * np.maximum(np.abs(ang) - 0.2, 0)
        return obs, reward, np.zeros(len(obs), bool)

    def cost(self, x, u, x_next):
        vel = x_next[:, 5]
        height = x_next[:, 0]
        ang = x_next[:, 1]
        return -(vel -
                 self.ctrl_cost_coeff * 0.5 * jnp.sum(jnp.square(u), axis=1) -
                 10.0 * jnp.maximum(0.45 - height, 0) -
                 10.0 * jnp.maximum(jnp.abs(ang) - 0.2, 0) -
                 jnp.sum(jnp.maximum(jnp.abs(x_next[:, 2:]) - 100.0, 0), axis=1))


class AntEnv(MujocoHostEnv):
    """Obs (29): torso COM, qpos[3:], COM vel, qvel[3:]
    (reference com_ant_env.py:21-30). The only env with analytic
    termination: done when torso z leaves [0.2, 1.0] or obs non-finite
    (:88-116); cost masked by dones in imagined rollouts (:70-75)."""

    XML = "ant.xml"
    FRAME_SKIP = 5
    COM_AXES = (0, 1, 2)
    VEL_AXES = (0, 1, 2)
    ROOT_POS_IDX = (0, 1, 2)
    ROOT_VEL_IDX = (0, 1, 2)
    POS_TAIL = 3
    VEL_TAIL = 3

    def __init__(self, seed: int = 0):
        super().__init__(seed)

    def get_current_obs(self) -> np.ndarray:
        qpos, qvel = self.data.qpos, self.data.qvel
        return np.concatenate([
            self.body_com(), qpos[3:],
            self.body_comvel(), qvel[3:],
        ])

    def post_step(self, action):
        com = self.body_com()
        comvel = self.body_comvel()
        action = np.clip(action, -1, 1)
        ctrl_cost = 0.5 * 1e-2 * np.sum(np.square(action))
        survive_reward = 0.05
        reward = comvel[0] - ctrl_cost + survive_reward
        obs = self.get_current_obs()
        notdone = np.isfinite(obs).all() and 0.2 <= com[2] <= 1.0
        return obs, float(reward), bool(not notdone), {}

    def batch_post_step(self, qpos, qvel, com, comvel, actions):
        obs = np.concatenate(
            [com, qpos[:, 3:], comvel, qvel[:, 3:]], axis=1)
        a = np.clip(actions, -1, 1)
        reward = comvel[:, 0] - 0.5 * 1e-2 * np.sum(
            np.square(a), axis=1) + 0.05
        notdone = np.isfinite(obs).all(axis=1) & \
            (com[:, 2] >= 0.2) & (com[:, 2] <= 1.0)
        return obs, reward, ~notdone

    def cost(self, x, u, x_next):
        vel = x_next[:, 15]
        return -(vel - 1e-2 * 0.5 * jnp.sum(jnp.square(u), axis=1) + 0.05)

    def cost_with_dones(self, x, u, x_next, dones):
        # reference cost_tf takes a dones mask (com_ant_env.py:70-75)
        vel = x_next[:, 15]
        return -((vel - 1e-2 * 0.5 * jnp.sum(jnp.square(u), axis=1) + 0.05)
                 * (1.0 - dones))

    def is_done(self, x, x_next):
        notdone = jnp.logical_and(
            jnp.logical_and(x_next[:, 2] >= 0.2, x_next[:, 2] <= 1.0),
            jnp.min(jnp.isfinite(x_next), axis=1))
        return jnp.logical_not(notdone)
