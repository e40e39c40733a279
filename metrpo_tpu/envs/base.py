"""Environment protocol.

ME-TRPO requires envs to expose an *analytic* cost as a known function of
(s, a, s') (reference README.md:4). The reference keeps three copies of
every cost function — numpy scalar ``cost_np``, numpy vector
``cost_np_vec``, and graph ``cost_tf`` (e.g. ``envs/com_swimmer_env.py:105-114``).
Here each env defines ONE ``jnp`` implementation, ``cost(x, u, x_next)``,
used everywhere: inside jitted ``lax.scan`` imagined rollouts (it is
differentiable), and on host numpy inputs for the real-env oracle checks.

Envs come in two flavors:
  - pure-JAX envs (Point2D, PointMass): fully functional, vmappable,
    steppable on device inside a scan;
  - host envs (MuJoCo family): stateful CPU stepping behind a batched
    adapter, the only host<->device boundary in the system.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Box:
    low: np.ndarray
    high: np.ndarray

    @property
    def shape(self):
        return self.low.shape

    @property
    def bounds(self):
        return (self.low, self.high)

    def sample(self, rng: np.random.Generator):
        return rng.uniform(self.low, self.high)


class AnalyticEnv:
    """Base class: spaces + analytic cost/termination in jnp.

    Subclasses must set ``observation_space``/``action_space`` and implement
    ``cost``. Action space is normalized to [-1, 1] (the reference wraps all
    envs in rllab ``normalize``, env_helpers.py:13-33).
    """

    observation_space: Box
    action_space: Box
    # goal-conditioned obs split (reference training.py:308-314)
    n_goals: int = 0

    @property
    def n_obs(self) -> int:
        return self.observation_space.shape[0]

    @property
    def n_states(self) -> int:
        return self.n_obs - self.n_goals

    @property
    def n_actions(self) -> int:
        return self.action_space.shape[0]

    # dt for 'second_derivative' prediction (reference training.py:315-318)
    dt: Optional[float] = None

    # -- analytic functions (single jnp source of truth) -------------------

    def cost(self, x, u, x_next) -> jnp.ndarray:
        """Vectorized cost over a batch: (B,S),(B,A),(B,S) -> (B,)."""
        raise NotImplementedError

    def cost_with_dones(self, x, u, x_next, dones) -> jnp.ndarray:
        """Done-masked cost used in imagined rollouts for envs with analytic
        termination (reference com_ant_env.py:70-75). Default: mask."""
        return self.cost(x, u, x_next) * (1.0 - dones)

    def is_done(self, x, x_next) -> Optional[jnp.ndarray]:
        """Analytic termination (B,) bool, or None if the env never
        terminates early (only Ant defines it in the reference)."""
        return None

    # -- numpy conveniences (same implementation, host inputs) -------------

    def cost_np_vec(self, x, u, x_next) -> np.ndarray:
        return np.asarray(self.cost(jnp.asarray(x), jnp.asarray(u), jnp.asarray(x_next)))

    def cost_np(self, x, u, x_next) -> float:
        return float(np.mean(self.cost_np_vec(x, u, x_next)))

    def is_done_np(self, x, x_next) -> np.ndarray:
        d = self.is_done(jnp.asarray(x), jnp.asarray(x_next))
        if d is None:
            return np.zeros(np.asarray(x).shape[0], dtype=bool)
        return np.asarray(d)

    @property
    def has_analytic_done(self) -> bool:
        # Probe with a 1-row dummy batch.
        x = jnp.zeros((1, self.n_obs))
        return self.is_done(x, x) is not None


class HostEnv(AnalyticEnv):
    """Stateful host-side env API (real-env data collection + oracle eval)."""

    def reset(self, init_state: Optional[np.ndarray] = None) -> np.ndarray:
        raise NotImplementedError

    def step(self, action: np.ndarray) -> Tuple[np.ndarray, float, bool, dict]:
        raise NotImplementedError

    def get_reset_state(self) -> np.ndarray:
        """Full simulator state (e.g. concat[qpos, qvel]) that ``reset_to``
        accepts — used to pin fixed validation initial states
        (reference model_based_rl.py:443-487)."""
        raise NotImplementedError

    def reset_to(self, reset_state: np.ndarray) -> np.ndarray:
        """Reset to an exact simulator state; returns the observation."""
        raise NotImplementedError


class JaxEnv(AnalyticEnv):
    """Pure-functional env API for fully on-device stepping.

    ``state`` is the full env state as a pytree of jnp arrays (for the toy
    envs it equals the observation).  All three functions are jit/vmap-able.
    """

    def initial_state(self, key) -> jnp.ndarray:
        raise NotImplementedError

    def observe(self, state) -> jnp.ndarray:
        return state

    def dynamics(self, state, action) -> jnp.ndarray:
        """One deterministic step: state, clipped action -> next state."""
        raise NotImplementedError


def _pre_step_is_noop(cls) -> bool:
    """True if ``cls`` inherits the base no-op ``pre_step`` (a custom
    pre-physics hook — e.g. manipulation envs capturing pre-step state —
    must take the per-env python path)."""
    from metrpo_tpu.envs.mujoco.host_env import MujocoHostEnv
    return getattr(cls, "pre_step", None) is MujocoHostEnv.pre_step


class VecHostEnv:
    """Batch of host envs stepped together (reference env_helpers.py:456-472).

    For MuJoCo env pools the physics segment of ``step_batch`` runs through
    the native C++ thread-pool stepper (``metrpo_tpu/native``) — the
    in-process replacement for the reference's fork-based
    ``ParallelVecEnvExecutor`` (envs/parallel_vec_env_executor.py:78-176):
    all B envs' ``mj_step`` loops execute in parallel with the GIL released,
    then each env's ``post_step`` (observation/reward/done) runs in python.
    Falls back to the serial per-env ``step`` loop when the native library
    is unavailable (``METRPO_NATIVE=0``, no compiler, non-MuJoCo envs);
    both paths produce bitwise-identical transitions.
    """

    def __init__(self, envs, native: bool = True):
        self.envs = list(envs)
        self._native = None
        self._batch_post = None
        if native and self.envs and all(
                hasattr(e, "model") and hasattr(e, "data") and
                callable(getattr(e, "post_step", None)) for e in self.envs):
            try:
                from metrpo_tpu.native import NativeStepper, native_available
                if native_available():
                    self._native = NativeStepper(self.envs)
            except Exception:  # noqa: BLE001 — any failure => serial path
                self._native = None
        if self._native is not None:
            # fully-batched post_step: the C++ workers extract
            # (qpos, qvel, com, comvel) rows and the env class computes
            # obs/reward/done vectorized over the whole batch — no per-env
            # python in the hot loop. Requires a homogeneous pool, a
            # batch_post_step impl, and no pre_step hook.
            e0 = self.envs[0]
            if (callable(getattr(e0, "batch_post_step", None))
                    and all(type(e) is type(e0) for e in self.envs)
                    and _pre_step_is_noop(type(e0))):
                self._batch_post = e0.batch_post_step

    def __len__(self):
        return len(self.envs)

    @property
    def native_active(self) -> bool:
        return self._native is not None

    def reset_to_batch(self, reset_states: np.ndarray) -> np.ndarray:
        return np.array([e.reset_to(x) for e, x in zip(self.envs, reset_states)])

    def reset_batch(self) -> np.ndarray:
        return np.array([e.reset() for e in self.envs])

    def step_batch(self, actions: np.ndarray):
        actions = np.asarray(actions)
        if self._batch_post is not None:
            # fully-batched path: C++ physics + state extraction, then ONE
            # vectorized obs/reward/done computation for the whole pool
            qpos, qvel, com, comvel = self._native.step_batch_extract(actions)
            obs, rs, ds = self._batch_post(qpos, qvel, com, comvel, actions)
            return (np.asarray(obs), np.asarray(rs), np.asarray(ds),
                    tuple({} for _ in self.envs))
        if self._native is not None:
            for e, a in zip(self.envs, actions):
                e.pre_step(a)
            self._native.step_batch(actions)
            results = [e.post_step(a) for e, a in zip(self.envs, actions)]
        else:
            results = [e.step(a) for e, a in zip(self.envs, actions)]
        obs, rs, ds, infos = zip(*results)
        return np.array(obs), np.array(rs), np.array(ds), infos
