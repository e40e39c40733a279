"""PointMass: double integrator with frame_skip and a random goal in the obs.

Behavioral port of reference ``envs/point_mass_env.py:9-103``. Obs is
[qpos(2), qvel(2), goal(2)] — the first env exercising the
n_states/n_goals split used by the 'state_change_goal' prediction type
(reference training.py:265-268).  Pure-JAX + host APIs like Point2D.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.envs.base import Box, HostEnv, JaxEnv


class PointMassEnv(JaxEnv, HostEnv):
    n_goals = 2

    def __init__(self, seed: int = 0):
        self.mass = 0.1
        self.dt = 0.01
        self.frame_skip = 5
        self.boundary = np.array([-10.0, 10.0])
        self.A = jnp.eye(2)
        self.B = jnp.array([[0.2, -0.04], [0.3, 0.9]])
        self.c = jnp.zeros(2)
        self.init_mean = np.zeros(2)
        self.init_std = 0.1
        self.ctrl_cost_coeff = 0.01
        inf = np.inf
        low = np.concatenate([self.boundary[0] * np.ones(2), -inf * np.ones(2),
                              self.boundary[0] * np.ones(2)]).astype(np.float32)
        high = np.concatenate([self.boundary[1] * np.ones(2), inf * np.ones(2),
                               self.boundary[1] * np.ones(2)]).astype(np.float32)
        self.observation_space = Box(low, high)
        self.action_space = Box(-np.ones(2, np.float32), np.ones(2, np.float32))
        self._qpos = None
        self._qvel = None
        self._goal = None

    # ---- pure-JAX functional API (state == obs [qpos,qvel,goal]) ---------

    def initial_state(self, key) -> jnp.ndarray:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        qpos = jnp.asarray(self.init_mean) + jax.random.normal(k1, (2,)) * self.init_std
        qvel = jnp.asarray(self.init_mean) + jax.random.normal(k2, (2,)) * self.init_std
        goal = jax.random.uniform(k3, (2,), minval=self.boundary[0], maxval=self.boundary[1])
        sign = (jax.random.uniform(k4, (2,)) > 0.5).astype(jnp.float32) * 2.0 - 1.0
        return jnp.concatenate([qpos, qvel, goal * sign])

    def dynamics(self, state, action) -> jnp.ndarray:
        action = jnp.clip(action, -1.0, 1.0)
        qpos, qvel, goal = state[:2], state[2:4], state[4:]

        def frame(carry, _):
            qpos, qvel = carry
            qpos = jnp.clip(qpos + qvel * self.dt, self.boundary[0], self.boundary[1])
            qvel = self.A @ qvel + self.B @ action + self.c
            return (qpos, qvel), None

        (qpos, qvel), _ = jax.lax.scan(frame, (qpos, qvel), None, length=self.frame_skip)
        return jnp.concatenate([qpos, qvel, goal])

    def cost(self, x, u, x_next) -> jnp.ndarray:
        # Goal is part of the obs; gradients must not flow through it
        # (reference point_mass_env.py:95-97 uses stop_gradient).
        goal = jax.lax.stop_gradient(x_next[:, 4:])
        return jnp.linalg.norm(goal - x_next[:, :2], axis=1) + \
            self.ctrl_cost_coeff * jnp.mean(jnp.square(u), axis=1)

    # ---- host stateful API ----------------------------------------------

    def reset(self, init_state: Optional[np.ndarray] = None) -> np.ndarray:
        if init_state is None:
            self._qpos = self.init_mean + np.random.randn(2) * self.init_std
            self._qvel = self.init_mean + np.random.randn(2) * self.init_std
            self._goal = np.random.uniform(-self.boundary, self.boundary) * \
                ((np.random.uniform(size=2) > 0.5).astype(np.float32) * 2 - 1.0)
        else:
            assert len(init_state) == 6
            self._qpos = np.asarray(init_state[:2], dtype=np.float64)
            self._qvel = np.asarray(init_state[2:4], dtype=np.float64)
            self._goal = np.asarray(init_state[4:], dtype=np.float64)
        return self._get_obs()

    def _get_obs(self) -> np.ndarray:
        return np.concatenate([self._qpos, self._qvel, self._goal])

    def step(self, action: np.ndarray):
        action = np.clip(np.reshape(action, -1), -1.0, 1.0)
        prev = self._get_obs()
        nxt = np.asarray(self.dynamics(jnp.asarray(prev, jnp.float32),
                                       jnp.asarray(action, jnp.float32)))
        self._qpos, self._qvel = nxt[:2].astype(np.float64), nxt[2:4].astype(np.float64)
        obs = self._get_obs()
        reward = -float(self.cost_np_vec(prev[None], action[None], obs[None])[0])
        return obs, reward, False, {}

    def get_reset_state(self) -> np.ndarray:
        return self._get_obs()

    def reset_to(self, reset_state: np.ndarray) -> np.ndarray:
        return self.reset(reset_state)
