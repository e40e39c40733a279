"""Humanoid, reacher and walker envs.

  - SimpleHumanoidEnv / HumanoidEnv: obs = qpos[3:] + qvel + head position,
    cost = (head_h - 1.5)^2 + ctrl (reference com_simple_humanoid_env.py:37-109).
    SimpleHumanoid runs the reduced 10-DOF model (in-tree
    assets/simple_humanoid.xml, reference vendor/mujoco_models/
    simple_humanoid.xml); HumanoidEnv is the same env contract on the full
    humanoid.xml (com_humanoid_env.py:1-6).
  - ReacherEnv: goal-conditioned obs [theta1, theta2, dtheta1, dtheta2,
    goal_xy] with an analytic fingertip forward-kinematics cost
    (reference envs/reacher_env.py:72-116) — exercises the n_goals split.
  - Walker2dEnv: raw walker2d env. The reference's walker cost functions
    are copy-pasted from reacher and reference undefined symbols
    (walker_env.py:55-77, SURVEY.md 2.33) — effectively unusable for
    ME-TRPO; here the env gets a well-defined forward-velocity cost
    instead so it is actually trainable.
"""

from __future__ import annotations

import jax.numpy as jnp
import mujoco
import numpy as np

from metrpo_tpu.envs.mujoco.host_env import MujocoHostEnv


class SimpleHumanoidEnv(MujocoHostEnv):
    XML = "simple_humanoid.xml"
    FRAME_SKIP = 5

    def __init__(self, seed: int = 0, ctrl_cost_coeff: float = 1e-3,
                 alive_bonus: float = 0.2):
        self.ctrl_cost_coeff = ctrl_cost_coeff
        # DEAD parameter, kept only for reference signature parity: the
        # reference's head-height cost never reads its alive_bonus either
        # (rllab simple_humanoid ctor arg, unused by the ME-TRPO shaped
        # cost) — not live config here.
        self.alive_bonus = alive_bonus
        super().__init__(seed)
        self._head_id = mujoco.mj_name2id(
            self.model, mujoco.mjtObj.mjOBJ_GEOM, "head")

    def _head_pos(self) -> np.ndarray:
        if not hasattr(self, "_head_id"):
            self._head_id = mujoco.mj_name2id(
                self.model, mujoco.mjtObj.mjOBJ_GEOM, "head")
        return self.data.geom_xpos[self._head_id].copy()

    def get_current_obs(self) -> np.ndarray:
        return np.concatenate([
            self.data.qpos[3:], self.data.qvel, self._head_pos(),
        ])

    def post_step(self, action):
        obs = self.get_current_obs()
        action = np.clip(action, -1, 1)
        head_h = self._head_pos()[-1]
        ctrl_cost = 1e-2 * self.ctrl_cost_coeff * np.sum(np.square(action))
        reward = -(head_h - 1.5) ** 2 - ctrl_cost
        return obs, float(reward), False, {}

    def cost(self, x, u, x_next):
        head_h = x_next[:, -1]
        ctrl_cost = 1e-2 * self.ctrl_cost_coeff * jnp.sum(jnp.square(u), axis=1)
        return (head_h - 1.5) ** 2 + ctrl_cost


class HumanoidEnv(SimpleHumanoidEnv):
    """Same observation/cost contract on the full humanoid model."""
    XML = "humanoid.xml"


class ReacherEnv(MujocoHostEnv):
    """Goal-conditioned: obs = [theta1, theta2, dtheta1, dtheta2, goal_xy].
    Cost uses analytic fingertip forward kinematics of the standard 2-link
    reacher (link lengths 0.1, 0.11 — reference reacher_env.py:108-116)."""

    XML = "reacher.xml"
    FRAME_SKIP = 2
    n_goals = 2
    ctrl_cost_coeff = 2.0

    def get_current_obs(self) -> np.ndarray:
        return np.concatenate([
            self.data.qpos[:2], self.data.qvel[:2], self.data.qpos[2:4],
        ])

    def reset(self, init_state=None):
        if init_state is not None:
            # obs-form init: [theta(2), dtheta(2), goal(2)]
            state = np.asarray(init_state, np.float64)
            qpos = np.concatenate([state[:2], state[4:6]])
            qvel = np.concatenate([state[2:4], np.zeros(2)])
            return self.reset_to(np.concatenate([qpos, qvel]))
        mujoco.mj_resetData(self.model, self.data)
        qpos = self.init_qpos + np.random.uniform(-0.1, 0.1, self.model.nq)
        while True:
            goal = np.random.uniform(-0.2, 0.2, 2)
            if np.linalg.norm(goal) < 0.2:
                break
        qpos[-2:] = goal
        qvel = self.init_qvel + np.random.uniform(-0.005, 0.005, self.model.nv)
        qvel[-2:] = 0
        self.data.qpos[:] = qpos
        self.data.qvel[:] = qvel
        mujoco.mj_forward(self.model, self.data)
        return self.get_current_obs()

    def pre_step(self, action):
        # reward needs the PRE-step observation (goal-relative fingertip
        # cost is a function of the state the action was taken in)
        self._obs_before = self.get_current_obs()

    def post_step(self, action):
        action = np.clip(np.reshape(action, -1), -1, 1)
        obs_next = self.get_current_obs()
        reward = -float(self.cost_np_vec(
            self._obs_before[None], action[None], obs_next[None])[0])
        return obs_next, reward, False, {}

    @staticmethod
    def _fingertips(x):
        xc = 0.1 * jnp.cos(x[:, 0]) + 0.11 * jnp.cos(x[:, 0] + x[:, 1])
        yc = 0.1 * jnp.sin(x[:, 0]) + 0.11 * jnp.sin(x[:, 0] + x[:, 1])
        return jnp.stack([xc, yc], axis=1)

    def cost(self, x, u, x_next):
        return jnp.linalg.norm(x[:, -2:] - self._fingertips(x), axis=1) + \
            self.ctrl_cost_coeff * 0.5 * jnp.sum(jnp.square(u), axis=1)


class Walker2dEnv(MujocoHostEnv):
    """Obs (18): torso COM [x,z], qpos[2:], COM vel [x,z], qvel[2:] —
    same layout as half-cheetah. Forward-velocity cost (in-tree fix for the
    reference's broken walker cost, walker_env.py:55-77)."""

    XML = "walker2d.xml"
    FRAME_SKIP = 4
    ctrl_cost_coeff = 1e-3

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
        reward = self.body_comvel()[0] - ctrl_cost
        return obs, float(reward), False, {}

    def cost(self, x, u, x_next):
        return -(x_next[:, 9] -
                 self.ctrl_cost_coeff * 0.5 * jnp.sum(jnp.square(u), axis=1))
