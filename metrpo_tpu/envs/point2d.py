"""Point2D: pure linear system x' = Ax + Bu + c with a fixed goal.

Behavioral port of reference ``envs/point2D_env.py:10-68`` (dynamics,
bounds, cost), re-designed as a pure-JAX env: state == observation, the
whole env (reset/step/cost) is jnp and vmappable, so real-env collection
and oracle evaluation can run fully on device.  No MuJoCo dependency —
this is the smoke-test env (SURVEY.md 2.30).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrpo_tpu.envs.base import Box, HostEnv, JaxEnv

CTRL_COST_COEFF = 0.01
GOAL = np.array([8.0, 5.0])


class Point2DEnv(JaxEnv, HostEnv):
    def __init__(self, seed: int = 0):
        self.A = jnp.array([[1.0, 0.03], [0.0, 1.0]])
        self.B = jnp.eye(2)
        self.c = jnp.zeros(2)
        self.goal = jnp.asarray(GOAL, jnp.float32)
        self.init_mean = np.zeros(2)
        self.init_std = 0.1
        self.ctrl_cost_coeff = CTRL_COST_COEFF
        self.observation_space = Box(-10 * np.ones(2, np.float32), 10 * np.ones(2, np.float32))
        self.action_space = Box(-np.ones(2, np.float32), np.ones(2, np.float32))
        self._state: Optional[np.ndarray] = None
        self._rng = np.random  # host resets use the global seeded RNG

    # ---- pure-JAX functional API ----------------------------------------

    def initial_state(self, key) -> jnp.ndarray:
        return jnp.asarray(self.init_mean) + jax.random.normal(key, (2,)) * self.init_std

    def dynamics(self, state, action) -> jnp.ndarray:
        action = jnp.clip(action, self.action_space.low, self.action_space.high)
        nxt = self.A @ state + self.B @ action + self.c
        return jnp.clip(nxt, self.observation_space.low, self.observation_space.high)

    def cost(self, x, u, x_next) -> jnp.ndarray:
        # dist-to-goal + ctrl cost (reference point2D_env.py:59-68)
        return jnp.linalg.norm(self.goal - x_next, axis=1) + \
            self.ctrl_cost_coeff * jnp.mean(jnp.square(u), axis=1)

    # ---- host stateful API ----------------------------------------------

    def reset(self, init_state: Optional[np.ndarray] = None) -> np.ndarray:
        if init_state is None:
            self._state = self.init_mean + np.random.randn(2) * self.init_std
        else:
            self._state = np.asarray(init_state, dtype=np.float64)
        return self._state.copy()

    def step(self, action: np.ndarray):
        assert self._state is not None, "call env.reset before step."
        action = np.clip(np.reshape(action, -1), -1.0, 1.0)
        nxt = np.asarray(self.dynamics(jnp.asarray(self._state, jnp.float32),
                                       jnp.asarray(action, jnp.float32)))
        prev = self._state
        self._state = nxt
        reward = -float(self.cost_np_vec(prev[None], action[None], nxt[None])[0])
        return self._state.copy(), reward, False, {}

    def get_reset_state(self) -> np.ndarray:
        return self._state.copy()

    def reset_to(self, reset_state: np.ndarray) -> np.ndarray:
        return self.reset(reset_state)
