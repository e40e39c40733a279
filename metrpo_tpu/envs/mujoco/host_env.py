"""Host-side MuJoCo env base.

The real-env ground truth stays on CPU (modern ``mujoco`` bindings replace
the reference's mujoco-py 0.5.7 via rllab's MujocoEnv — SURVEY.md §2.9-bis);
the analytic cost functions live in jnp on the subclasses.  Actions arrive
normalized to [-1, 1] (the rllab ``normalize`` wrapper contract,
env_helpers.py:13-33) and are scaled to the actuator ctrlrange here.

COM observations use MuJoCo's subtree quantities: ``data.subtree_com`` for
the body-subtree center of mass and ``mj_subtreeVel``'s
``data.subtree_linvel`` for its velocity (the modern equivalents of rllab's
``get_body_com`` / ``get_body_comvel``).
"""

from __future__ import annotations

import os
from typing import Optional

import mujoco
import numpy as np

from metrpo_tpu.envs.base import Box, HostEnv

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def _gym_asset(name: str) -> str:
    import gymnasium.envs.mujoco as gm
    return os.path.join(os.path.dirname(gm.__file__), "assets", name)


def resolve_asset(name: str) -> str:
    local = os.path.join(_ASSETS, name)
    if os.path.exists(local):
        return local
    return _gym_asset(name)


class MujocoHostEnv(HostEnv):
    """Stateful single MuJoCo sim with the HostEnv API."""

    XML: str = ""
    FRAME_SKIP: int = 5
    # reset-state noise (rllab MujocoEnv-style small gaussian perturbations)
    RESET_NOISE_QPOS: float = 0.01
    RESET_NOISE_QVEL: float = 0.01

    def __init__(self, seed: int = 0):
        self.model = mujoco.MjModel.from_xml_path(resolve_asset(self.XML))
        self.data = mujoco.MjData(self.model)
        self.init_qpos = self.data.qpos.copy()
        self.init_qvel = self.data.qvel.copy()
        self._torso_id = mujoco.mj_name2id(
            self.model, mujoco.mjtObj.mjOBJ_BODY, "torso")
        n_act = self.model.nu
        self.action_space = Box(-np.ones(n_act, np.float32),
                                np.ones(n_act, np.float32))
        obs = self.reset()
        inf = np.inf
        self.observation_space = Box(-inf * np.ones(obs.shape[0], np.float32),
                                     inf * np.ones(obs.shape[0], np.float32))

    # -- mujoco helpers ----------------------------------------------------

    @property
    def dt(self) -> float:
        return self.model.opt.timestep * self.FRAME_SKIP

    def body_com(self, body_id: Optional[int] = None) -> np.ndarray:
        bid = self._torso_id if body_id is None else body_id
        return self.data.subtree_com[bid].copy()

    def body_comvel(self, body_id: Optional[int] = None) -> np.ndarray:
        bid = self._torso_id if body_id is None else body_id
        mujoco.mj_subtreeVel(self.model, self.data)
        return self.data.subtree_linvel[bid].copy()

    def _scale_action(self, action: np.ndarray) -> np.ndarray:
        lo, hi = self.model.actuator_ctrlrange[:, 0], self.model.actuator_ctrlrange[:, 1]
        return lo + (np.clip(action, -1.0, 1.0) + 1.0) * 0.5 * (hi - lo)

    def forward_dynamics(self, action: np.ndarray):
        self.data.ctrl[:] = self._scale_action(action)
        for _ in range(self.FRAME_SKIP):
            mujoco.mj_step(self.model, self.data)
        # mj_step leaves derived quantities (xpos, cvel, subtree_*) at the
        # pre-integration state; recompute them for the new qpos/qvel so
        # COM observations are current (rllab called model.forward() too).
        mujoco.mj_forward(self.model, self.data)

    # -- COM-observation -> simulator-state reconstruction ----------------
    # The reference seeds rollouts from an OBSERVATION: its swimmer rebuilds
    # qpos/qvel from the COM obs analytically (get_original_representation,
    # envs/com_swimmer_env.py:16-32) inside reset(init_state), with the
    # round-trip invariant asserted at model_based_rl.py:474-475.  Here the
    # reconstruction is general and exact for every COM env: set the obs's
    # qpos/qvel tails, zero the root dofs, measure the resulting subtree
    # COM (offset) and COM velocity, and solve the roots — root slide /
    # free-joint translation contributes to the COM with coefficient
    # exactly 1 along its world axis, so one linear correction suffices.
    # Subclasses declare the obs layout via the class attrs below
    # (COM_AXES None = env has no COM obs; reset(init_state) stays raw).
    COM_AXES: tuple = None   # COM axes at the head of the obs
    VEL_AXES: tuple = None   # COM-velocity axes in the obs
    ROOT_POS_IDX: tuple = () # qpos indices solved from the COM entries
    ROOT_VEL_IDX: tuple = () # qvel indices solved from the COM-vel entries
    POS_TAIL: int = 2        # obs carries qpos[POS_TAIL:]
    VEL_TAIL: int = 2        # obs carries qvel[VEL_TAIL:]

    def reset_from_obs(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float64)
        m, d = self.model, self.data
        ca, va = list(self.COM_AXES), list(self.VEL_AXES)
        pos_tail = m.nq - self.POS_TAIL
        qpos_tail = obs[len(ca):len(ca) + pos_tail]
        comvel_obs = obs[len(ca) + pos_tail:len(ca) + pos_tail + len(va)]
        qvel_tail = obs[len(ca) + pos_tail + len(va):]
        if qvel_tail.shape[0] != m.nv - self.VEL_TAIL:
            # hard error, not an assert: a malformed observation must not
            # silently produce a corrupted reconstructed state under
            # python -O (ADVICE r4)
            raise ValueError(
                f"obs dim mismatch for {type(self).__name__}: got "
                f"{obs.shape[0]}-dim obs leaving a {qvel_tail.shape[0]}-dim "
                f"qvel tail, expected {m.nv - self.VEL_TAIL}")
        mujoco.mj_resetData(m, d)
        d.qpos[:] = self.init_qpos
        d.qpos[self.POS_TAIL:] = qpos_tail
        for i in self.ROOT_POS_IDX:
            d.qpos[i] = 0.0
        d.qvel[:] = 0.0
        d.qvel[self.VEL_TAIL:] = qvel_tail
        mujoco.mj_forward(m, d)
        com0 = self.body_com()
        for j, i in enumerate(self.ROOT_POS_IDX):
            d.qpos[i] = obs[j] - com0[ca[j]]
        mujoco.mj_forward(m, d)
        comvel0 = self.body_comvel()
        for j, i in enumerate(self.ROOT_VEL_IDX):
            d.qvel[i] = comvel_obs[j] - comvel0[va[j]]
        mujoco.mj_forward(m, d)
        return self.get_current_obs()

    # -- HostEnv API -------------------------------------------------------

    def get_current_obs(self) -> np.ndarray:
        raise NotImplementedError

    def reset(self, init_state: Optional[np.ndarray] = None) -> np.ndarray:
        """Reset; ``init_state`` follows the reference contract: it is an
        OBSERVATION for COM envs (rebuilt via ``reset_from_obs``;
        env_helpers.py obs seeding) and a raw ``concat[qpos, qvel]`` state
        otherwise. Callers holding a raw state for a COM env must use
        ``reset_to()`` — for SwimmerEnv both are 10-dim, so a raw state
        passed here would be reinterpreted as an observation (ADVICE r4).
        """
        if init_state is not None and self.COM_AXES is not None:
            # reference contract: init_state is an OBSERVATION
            return self.reset_from_obs(init_state)
        mujoco.mj_resetData(self.model, self.data)
        if init_state is None:
            self.data.qpos[:] = self.init_qpos + \
                np.random.normal(size=self.model.nq) * self.RESET_NOISE_QPOS
            self.data.qvel[:] = self.init_qvel + \
                np.random.normal(size=self.model.nv) * self.RESET_NOISE_QVEL
        else:
            self._apply_init_state(np.asarray(init_state, np.float64))
        mujoco.mj_forward(self.model, self.data)
        return self.get_current_obs()

    def _apply_init_state(self, init_state: np.ndarray):
        """Default: init_state = concat[qpos, qvel]."""
        nq = self.model.nq
        self.data.qpos[:] = init_state[:nq]
        self.data.qvel[:] = init_state[nq: nq + self.model.nv]

    def get_reset_state(self) -> np.ndarray:
        return np.concatenate([self.data.qpos, self.data.qvel])

    def reset_to(self, reset_state: np.ndarray) -> np.ndarray:
        mujoco.mj_resetData(self.model, self.data)
        self._apply_init_state(np.asarray(reset_state, np.float64))
        mujoco.mj_forward(self.model, self.data)
        return self.get_current_obs()

    def step(self, action: np.ndarray):
        """One env step = pre_step hook -> physics -> post_step.

        The physics segment (``forward_dynamics``) is exactly what the
        native batched stepper (``metrpo_tpu/native``) runs in C++ across a
        VecHostEnv pool; pre/post hooks hold the env-specific observation /
        reward / termination logic and stay in python either way.
        """
        self.pre_step(action)
        self.forward_dynamics(action)
        return self.post_step(action)

    def pre_step(self, action: np.ndarray) -> None:
        """Hook before physics (e.g. capture the pre-step observation)."""

    def post_step(self, action: np.ndarray):
        """(obs, reward, done, info) from the post-physics MjData state."""
        raise NotImplementedError

    # -- rendering (video monitor support, reference rollout_params
    #    is_monitored / monitorpath, env_helpers.py:373-375) --------------

    _renderer = None

    def render_frame(self, width: int = 320, height: int = 240) -> np.ndarray:
        if self._renderer is None:
            os.environ.setdefault("MUJOCO_GL", "egl")  # headless rendering
            self._renderer = mujoco.Renderer(self.model, height, width)
        self._renderer.update_scene(self.data)
        return self._renderer.render()
