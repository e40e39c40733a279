"""K-member dynamics ensemble as a vmapped parameter stack.

Re-design of the reference's per-scope graph ensemble
(``training.py:216-270`` dynamics_model factory + ``model_based_rl.py:23-103``
build_dynamics_graph): instead of K named variable scopes sliced out of a
stacked placeholder, the ensemble is ONE param pytree with a leading K axis
(``jax.vmap`` over members).  All K members train in a single jitted step on
disjoint minibatches — the vectorized form of ``model_based_rl.py:48-71`` —
and all K test-time predictions come from one vmapped forward.

Prediction semantics match the reference exactly:
  - inputs are rms-normalized (s, g, a); goals are dropped from the net
    input (``training.py:134-135``);
  - optional ignore_xy/ignore_x input masking (``training.py:146-154``);
  - 'state_change':  s' = diff_mean + diff_std * nn_out + s  (``:255-257``)
  - 'second_derivative': Euler integration qpos' = qpos + dt*qvel,
    qvel' = qvel + dt*nn_out (``:259-264``)
  - '_goal' variants append the goal passthrough (``:265-268``)
  - optional sigmoid gating net on the last hidden layer (``:234-244``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from metrpo_tpu.config import DynamicsModelParams, resolve_activation, resolve_regularizer
from metrpo_tpu.models.mlp import (ensemble_init, mlp_apply,
                                   mlp_apply_ragged, mlp_init)
from metrpo_tpu.utils.normalizer import RunningStats


class DynamicsEnsemble(NamedTuple):
    """Static definition; params + rms stats are explicit arguments."""

    n_states: int
    n_actions: int
    n_goals: int
    n_models: int
    hidden_layers: tuple
    hidden_act: Callable
    prediction_type: str
    ignore_xy_input: bool
    ignore_x_input: bool
    use_logit_weights: bool
    reg_fn: Optional[Callable]
    reg_constant: float
    dt: Optional[float]
    dtype: jnp.dtype

    @staticmethod
    def create(n_states: int, n_actions: int, n_goals: int,
               cfg: DynamicsModelParams, n_models: int,
               dt: Optional[float] = None) -> "DynamicsEnsemble":
        acts = tuple(cfg.nonlinearity)
        assert len(set(acts)) == 1, "mixed per-layer activations not supported yet"
        if cfg.prediction_type in ("state_change", "state_change_goal"):
            pass
        else:
            assert cfg.prediction_type in ("second_derivative", "second_derivative_goal")
            assert n_states % 2 == 0
            assert dt is not None, "'second_derivative' needs env dt"
        return DynamicsEnsemble(
            n_states=n_states,
            n_actions=n_actions,
            n_goals=n_goals,
            n_models=n_models,
            hidden_layers=tuple(cfg.hidden_layers),
            hidden_act=resolve_activation(acts[0]),
            prediction_type=cfg.prediction_type,
            ignore_xy_input=cfg.ignore_xy_input,
            ignore_x_input=cfg.ignore_x_input,
            use_logit_weights=cfg.use_logit_weights,
            reg_fn=resolve_regularizer(cfg.regularization.method),
            reg_constant=cfg.regularization.constant,
            dt=dt,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        )

    # -- shapes ------------------------------------------------------------

    @property
    def n_obs(self) -> int:
        return self.n_states + self.n_goals

    @property
    def n_inputs(self) -> int:
        n = self.n_states + self.n_actions
        if self.ignore_xy_input:
            n -= 2
        elif self.ignore_x_input:
            n -= 1
        return n

    @property
    def n_outputs(self) -> int:
        if "state_change" in self.prediction_type:
            return self.n_states
        return self.n_states // 2

    @property
    def _sizes(self):
        return [self.n_inputs, *self.hidden_layers, self.n_outputs]

    @property
    def _gate_sizes(self):
        # Sigmoid gating net: same trunk, output = last hidden width.
        return [self.n_inputs, *self.hidden_layers[:-1], self.hidden_layers[-1]]

    # -- init --------------------------------------------------------------

    def init_member(self, key) -> dict:
        # params are always fp32 masters; self.dtype is the COMPUTE dtype
        # (mixed precision: bf16 matmuls, fp32 accumulation and updates)
        p = {"net": mlp_init(key, self._sizes, jnp.float32)}
        if self.use_logit_weights:
            key_g = jax.random.fold_in(key, 1)
            p["gate"] = mlp_init(key_g, self._gate_sizes, jnp.float32)
        return p

    def init(self, key) -> dict:
        """Stacked params for all K members (leading axis K on every leaf)."""
        keys = jax.random.split(key, self.n_models)
        return jax.vmap(self.init_member)(keys)

    # -- forward -----------------------------------------------------------

    def _split_xgu(self, xgu):
        s = xgu[..., : self.n_states]
        g = xgu[..., self.n_states: self.n_states + self.n_goals]
        a = xgu[..., self.n_states + self.n_goals:]
        return s, g, a

    def _nn_input(self, xgu: jnp.ndarray, input_stats: RunningStats):
        """Member-independent input normalization + masking.
        Returns (nn_in, s, g)."""
        xgu_norm = (xgu - input_stats.mean) / input_stats.std
        s, g, _ = self._split_xgu(xgu)
        s_n, _, a_n = self._split_xgu(xgu_norm)
        xu_norm = jnp.concatenate([s_n, a_n], axis=-1)
        if self.ignore_xy_input:
            nn_in = xu_norm[..., 2:]
        elif self.ignore_x_input:
            nn_in = xu_norm[..., 1:]
        else:
            nn_in = xu_norm
        return nn_in, s, g

    def _postprocess(self, out: jnp.ndarray, s: jnp.ndarray, g: jnp.ndarray,
                     diff_stats: RunningStats) -> jnp.ndarray:
        """Member-independent output integration (training.py:255-268)."""
        out = out.astype(jnp.float32)
        if "state_change" in self.prediction_type:
            # s' = diff_mean[:S] + diff_std[:S] * out + s (training.py:255-257)
            nxt = diff_stats.mean[: self.n_states] + \
                diff_stats.std[: self.n_outputs] * out + s
        else:
            half = self.n_outputs
            qpos = s[..., :half] + self.dt * s[..., half: self.n_states]
            qvel = s[..., half: self.n_states] + self.dt * out
            nxt = jnp.concatenate([qpos, qvel], axis=-1)
        if "_goal" in self.prediction_type:
            nxt = jnp.concatenate([nxt, g], axis=-1)
        return nxt

    def apply_member(self, params: dict, xgu: jnp.ndarray,
                     input_stats: RunningStats, diff_stats: RunningStats) -> jnp.ndarray:
        """One member's next-state prediction on a batch (B, S+G+A) -> (B, S+G)."""
        nn_in, s, g = self._nn_input(xgu, input_stats)
        cdt = None if self.dtype == jnp.float32 else self.dtype
        gate = None
        if self.use_logit_weights:
            gate = mlp_apply(params["gate"], nn_in, self.hidden_act,
                             jax.nn.sigmoid, compute_dtype=cdt)
        out = mlp_apply(params["net"], nn_in, self.hidden_act, gate=gate,
                        compute_dtype=cdt)
        return self._postprocess(out, s, g, diff_stats)

    def apply_ragged(self, params: dict, xgu: jnp.ndarray,
                     group_sizes: jnp.ndarray, member_of_row: jnp.ndarray,
                     input_stats: RunningStats,
                     diff_stats: RunningStats) -> jnp.ndarray:
        """Per-row member assignment: (B, D), (K,), (B,) -> (B, S+G).

        Rows must be pre-sorted by member (``group_sizes[k]`` consecutive
        rows for member k).  Row i's prediction equals row i of
        ``apply_all(...)[member_of_row[i]]`` — the faithful 'random member
        per particle' semantics — but via grouped matmuls
        (``jax.lax.ragged_dot``) the MXU work is B rows instead of K*B.
        Gating nets are unsupported here (callers fall back to
        ``apply_all``)."""
        assert not self.use_logit_weights, "ragged path has no gating net"
        nn_in, s, g = self._nn_input(xgu, input_stats)
        cdt = None if self.dtype == jnp.float32 else self.dtype
        out = mlp_apply_ragged(params["net"], nn_in, group_sizes,
                               member_of_row, self.hidden_act,
                               compute_dtype=cdt)
        return self._postprocess(out, s, g, diff_stats)

    def apply_all(self, params: dict, xgu: jnp.ndarray,
                  input_stats: RunningStats, diff_stats: RunningStats) -> jnp.ndarray:
        """All K members on the SAME batch: (B, D) -> (K, B, S+G).
        Test-time path (reference model_based_rl.py:91-97)."""
        return jax.vmap(
            lambda p: self.apply_member(p, xgu, input_stats, diff_stats)
        )(params)

    def apply_batched(self, params: dict, xgu: jnp.ndarray,
                      input_stats: RunningStats, diff_stats: RunningStats) -> jnp.ndarray:
        """Each member on ITS OWN batch: (K, B, D) -> (K, B, S+G).
        Training path (vectorized model_based_rl.py:48-55)."""
        return jax.vmap(
            lambda p, x: self.apply_member(p, x, input_stats, diff_stats)
        )(params, xgu)

    # -- losses ------------------------------------------------------------

    def prediction_losses(self, params: dict, x: jnp.ndarray, y: jnp.ndarray,
                          input_stats: RunningStats, diff_stats: RunningStats) -> jnp.ndarray:
        """Per-member mean-over-batch sum-of-squares loss, (K,B,D),(K,B,S+G)->(K,).
        Matches reference loss reduce_mean(reduce_sum(sq, axis=1))
        (model_based_rl.py:57-71); for '_goal' envs the target includes the
        goal passthrough which contributes zero loss."""
        pred = self.apply_batched(params, x, input_stats, diff_stats)
        return jnp.mean(jnp.sum(jnp.square(pred - y), axis=-1), axis=-1)

    def regularizer_losses(self, params: dict) -> jnp.ndarray:
        """Per-member regularizer (K,) (reference training.py:272-283)."""
        if self.reg_fn is None or self.reg_constant == 0.0:
            return jnp.zeros((self.n_models,))

        def member_reg(p):
            leaves = jax.tree_util.tree_leaves(p)
            return self.reg_constant * sum(self.reg_fn(l) for l in leaves)

        return jax.vmap(member_reg)(params)
