"""Configuration system.

Mirrors the reference's JSON-per-env config schema (reference:
``namedtuples.py:3-44``, ``training.py:48-65``) as frozen dataclasses, with a
string->callable registry replacing the reference's ``eval()``-based function
references (``training.py:82,156,276``) and a recursive override merge
mirroring ``run_model_based_rl.py:43-51`` / ``utils.py:318-332``.
"""

from __future__ import annotations

import copy
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# String -> callable registry (replaces eval'd "tf.nn.relu" style references)
# ---------------------------------------------------------------------------

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
    "swish": jax.nn.swish,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
    # Aliases accepted for configs written against the reference's TF names.
    "tf.nn.relu": jax.nn.relu,
    "tf.nn.tanh": jnp.tanh,
    "tf.tanh": jnp.tanh,
    "tf.nn.sigmoid": jax.nn.sigmoid,
    "tf.identity": lambda x: x,
}

REGULARIZERS: dict[str, Callable] = {
    # l2_loss(t) = sum(t**2) / 2 — matches tf.nn.l2_loss semantics.
    "l2": lambda t: 0.5 * jnp.sum(jnp.square(t)),
    "l1": lambda t: jnp.sum(jnp.abs(t)),
    "tf.nn.l2_loss": lambda t: 0.5 * jnp.sum(jnp.square(t)),
}


def resolve_activation(name: str) -> Callable:
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise KeyError(f"Unknown activation {name!r}; known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


def resolve_regularizer(name: Optional[str]) -> Optional[Callable]:
    if name in (None, ""):
        return None
    if callable(name):
        return name
    if name not in REGULARIZERS:
        raise KeyError(f"Unknown regularizer {name!r}; known: {sorted(REGULARIZERS)}")
    return REGULARIZERS[name]


# ---------------------------------------------------------------------------
# Stop criteria (reference utils.py:285-296)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StopCriterion:
    """Relative-increase stop test.

    scalar mode: stop when (new - old) / (|old| + offset) > threshold.
    vector mode (ensemble vote): stop when the fraction of members whose
    loss increased exceeds ``percent_models_threshold`` — the core ME-TRPO
    early-stopping rule (reference ``utils.py:285-296``).
    """

    threshold: float = 0.1
    offset: float = 1e-5
    percent_models_threshold: float = 0.5

    def scalar(self, loss_old: float, loss_new: float) -> bool:
        return (loss_new - loss_old) / (abs(loss_old) + self.offset) > self.threshold

    def vector(self, loss_old: np.ndarray, loss_new: np.ndarray) -> bool:
        increased = np.asarray(loss_new) > np.asarray(loss_old)
        return float(np.mean(increased)) > self.percent_models_threshold

    def __call__(self, loss_old, loss_new, mode: str = "scalar") -> bool:
        if mode == "scalar":
            return self.scalar(loss_old, loss_new)
        assert mode == "vector"
        return self.vector(loss_old, loss_new)


# ---------------------------------------------------------------------------
# Config dataclasses (reference namedtuples.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DynamicsOptParams:
    """Dynamics-fit hyperparameters (reference Dynamics_opt_params)."""

    learning_rate: dict = field(default_factory=lambda: {"scratch": 1e-3, "refine": 1e-3})
    log_every: int = 5          # in data passes
    max_passes: int = 2000
    stop_criterion: StopCriterion = field(default_factory=StopCriterion)
    batch_size: int = 1000      # per ensemble member
    sample_mode: str = "random"  # 'random' | 'next_batch'
    reinitialize: int = 0        # re-init models every N sweeps (0/False = never)
    num_passes_threshold: int = 25  # patience, in data passes


@dataclass(frozen=True)
class TrpoParams:
    init_std: float = 1.0
    step_size: float = 0.01
    discount: float = 1.0
    batch_size: int = 50000
    reset: bool = True
    gae_lambda: float = 1.0
    cg_iters: int = 10
    backtrack_ratio: float = 0.8
    max_backtracks: int = 15
    reg_coeff: float = 1e-5


@dataclass(frozen=True)
class VpgParams:
    init_std: float = 1.0
    discount: float = 1.0
    batch_size: int = 50000
    reset: bool = True
    learning_rate: float = 1e-3
    gae_lambda: float = 1.0


@dataclass(frozen=True)
class PolicyOptParams:
    """Policy-optimization hyperparameters (reference Policy_opt_params)."""

    mode: str = "estimated"  # real | estimated | second_estimated | ... |
    #                          trpo_mean | one_model | no_early
    whole: bool = True
    T: int = 100
    gamma: float = 1.0
    grad_norm_clipping: Optional[float] = 10.0
    learning_rate: float = 1e-3
    log_every: int = 5
    num_iters_threshold: int = 25
    max_iters: int = 400
    oracle_maxtimestep: int = 100
    stop_criterion: StopCriterion = field(
        default_factory=lambda: StopCriterion(percent_models_threshold=0.3)
    )
    validation_init_path: str = ""
    validation_reset_init_path: str = ""
    trpo: TrpoParams = field(default_factory=TrpoParams)
    vpg: VpgParams = field(default_factory=VpgParams)
    batch_size: int = 500    # number of imagined particles / validation inits
    sam_mode: str = "step_rand"
    remat: bool = False      # jax.checkpoint the BPTT rollout step (O(1)-in-T memory)
    rollout_unroll: int = 2  # lax.scan unroll factor for the imagined sampler;
    #   2 lets XLA overlap step t+1's ensemble-weight HBM fetch with step t's
    #   compute (+20% steps/s on v5e at the B=500 headline workload)
    step_rand_impl: str = "all_k"  # step_rand execution strategy: 'all_k'
    #   (forward every member, gather) or 'ragged' (sort particles by the
    #   sampled member, grouped matmuls via jax.lax.ragged_dot — identical
    #   member draws/semantics, ~K x fewer MXU FLOPs in the hot loop)


@dataclass(frozen=True)
class ExplorationParams:
    initial_param_std: float = 0.0
    param_noise: float = 1.0
    action_noise: float = 1.0
    vary_trajectory_noise: bool = False


@dataclass(frozen=True)
class RolloutParams:
    """Real-env rollout hyperparameters (reference Rollout_params)."""

    training_data_size: int = 100000
    validation_data_size: int = 50000
    split_ratio: float = 1.0 / 3.0
    splitting_mode: str = "trajectory"  # 'trajectory' | 'triplet'
    use_same_dataset: bool = True
    exploration: ExplorationParams = field(default_factory=ExplorationParams)
    datapath: str = ""
    is_monitored: bool = False
    monitorpath: str = ""
    max_timestep: int = 100
    render_every: Optional[int] = None
    load_rollout_data: bool = False


@dataclass(frozen=True)
class RegularizationParams:
    method: Optional[str] = "l2"
    constant: float = 0.0


@dataclass(frozen=True)
class DynamicsModelParams:
    hidden_layers: tuple = (512, 512)
    nonlinearity: tuple = ("relu", "relu")
    regularization: RegularizationParams = field(default_factory=RegularizationParams)
    ignore_xy_input: bool = False
    ignore_x_input: bool = False
    prediction_type: str = "state_change"  # | second_derivative | *_goal
    use_logit_weights: bool = False
    dtype: str = "float32"


@dataclass(frozen=True)
class PolicyModelParams:
    hidden_layers: tuple = (32, 32)
    hidden_nonlinearity: str = "tanh"
    output_nonlinearity: str = "identity"


@dataclass(frozen=True)
class ExperimentConfig:
    """Top level config — one per env, loaded from params/params-<env>.json."""

    algo: str = "trpo"   # trpo | vpg | bptt | bptt-stochastic | svg | l-bfgs | ppo
    env: str = "point2D"
    n_models: int = 5
    sample_size: int = 3000
    sweep_iters: int = 100
    seed: int = 0
    # TF_SUMMARY gate (reference model_based_rl.py:21): when on, weight/
    # gradient/loss-distribution summaries stream to tf_logs/{train,val}.
    tf_summary: bool = False
    # Model-error diagnostics cadence: every N sweeps run the k-step
    # open-loop error suite + horizon-end error distributions
    # (evaluate.py), dropping state_diff_<sweep>.csv + histograms under
    # <snapshot_dir>/model_diag/. 0 = off. The reference keeps these
    # importable in the loop but commented out (model_based_rl.py:622-635).
    model_diag_every: int = 0
    policy: PolicyModelParams = field(default_factory=PolicyModelParams)
    dynamics_model: DynamicsModelParams = field(default_factory=DynamicsModelParams)
    dynamics_opt_params: DynamicsOptParams = field(default_factory=DynamicsOptParams)
    policy_opt_params: PolicyOptParams = field(default_factory=PolicyOptParams)
    rollout_params: RolloutParams = field(default_factory=RolloutParams)

    def __post_init__(self):
        # Horizon consistency assert (reference training.py:67-69).
        assert (
            self.rollout_params.max_timestep
            == self.policy_opt_params.oracle_maxtimestep
            == self.policy_opt_params.T
        ), "max_timestep, oracle_maxtimestep and T must agree"


# ---------------------------------------------------------------------------
# JSON loading + recursive override merge
# ---------------------------------------------------------------------------


def _strip_comments(d: Any) -> Any:
    """Drop '_comment*' keys used as inline documentation in params files."""
    if isinstance(d, dict):
        return {
            k: _strip_comments(v)
            for k, v in d.items()
            if not k.startswith("_comment")
        }
    return d


def update_dictionary(old: dict, new: dict, strict: bool = False) -> dict:
    """Recursive in-place merge of ``new`` into ``old``.

    Mirrors reference ``utils.py:318-332``; ``strict`` asserts key existence
    like ``run_model_based_rl.py:43-51``'s replace_dict.
    """
    for key, value in new.items():
        if key in old and isinstance(value, dict) and isinstance(old.get(key), dict):
            update_dictionary(old[key], value, strict=strict)
        else:
            if strict and key not in old:
                raise KeyError(f"Override key {key!r} not present in base config")
            old[key] = value
    return old


def _build_stop(d: dict, default_pct: float = 0.5) -> StopCriterion:
    return StopCriterion(
        threshold=d.get("threshold", 0.1),
        offset=d.get("offset", 1e-5),
        percent_models_threshold=d.get("percent_models_threshold", default_pct),
    )


def config_from_dict(raw: dict) -> ExperimentConfig:
    raw = _strip_comments(copy.deepcopy(raw))

    dyn_raw = raw.get("dynamics_model", {})
    reg_raw = dyn_raw.pop("regularization", {})
    dyn = DynamicsModelParams(
        hidden_layers=tuple(dyn_raw.get("hidden_layers", (512, 512))),
        nonlinearity=tuple(dyn_raw.get("nonlinearity", ("relu", "relu"))),
        regularization=RegularizationParams(
            method=reg_raw.get("method", "l2"), constant=reg_raw.get("constant", 0.0)
        ),
        ignore_xy_input=bool(dyn_raw.get("ignore_xy_input", False)),
        ignore_x_input=bool(dyn_raw.get("ignore_x_input", False)),
        prediction_type=dyn_raw.get("prediction_type", "state_change"),
        use_logit_weights=bool(dyn_raw.get("use_logit_weights", False)),
        dtype=dyn_raw.get("dtype", "float32"),
    )

    pol_raw = raw.get("policy", {})
    pol = PolicyModelParams(
        hidden_layers=tuple(pol_raw.get("hidden_layers", (32, 32))),
        hidden_nonlinearity=pol_raw.get("hidden_nonlinearity", "tanh"),
        output_nonlinearity=pol_raw.get("output_nonlinearity", "identity"),
    )

    dop_raw = raw.get("dynamics_opt_params", {})
    dop = DynamicsOptParams(
        learning_rate=dop_raw.get("learning_rate", {"scratch": 1e-3, "refine": 1e-3}),
        log_every=dop_raw.get("log_every", 5),
        max_passes=dop_raw.get("max_passes", 2000),
        stop_criterion=_build_stop(dop_raw.get("stop_critereon", dop_raw.get("stop_criterion", {}))),
        batch_size=dop_raw.get("batch_size", 1000),
        sample_mode=dop_raw.get("sample_mode", "random"),
        reinitialize=int(dop_raw.get("reinitialize", 0) or 0),
        num_passes_threshold=dop_raw.get("num_passes_threshold", 25),
    )

    pop_raw = raw.get("policy_opt_params", {})
    trpo_raw = pop_raw.get("trpo", {})
    vpg_raw = pop_raw.get("vpg", {})
    pop = PolicyOptParams(
        mode=pop_raw.get("mode", "estimated"),
        whole=bool(pop_raw.get("whole", True)),
        T=pop_raw.get("T", 100),
        gamma=pop_raw.get("gamma", 1.0),
        grad_norm_clipping=pop_raw.get("grad_norm_clipping", 10.0),
        learning_rate=pop_raw.get("learning_rate", 1e-3),
        log_every=pop_raw.get("log_every", 5),
        num_iters_threshold=pop_raw.get("num_iters_threshold", 25),
        max_iters=pop_raw.get("max_iters", 400),
        oracle_maxtimestep=pop_raw.get("oracle_maxtimestep", pop_raw.get("T", 100)),
        stop_criterion=_build_stop(
            pop_raw.get("stop_critereon", pop_raw.get("stop_criterion", {})),
            default_pct=0.3,
        ),
        validation_init_path=pop_raw.get("validation_init_path", ""),
        validation_reset_init_path=pop_raw.get("validation_reset_init_path", ""),
        trpo=TrpoParams(
            init_std=trpo_raw.get("init_std", 1.0),
            step_size=trpo_raw.get("step_size", 0.01),
            discount=trpo_raw.get("discount", 1.0),
            batch_size=trpo_raw.get("batch_size", 50000),
            reset=bool(trpo_raw.get("reset", True)),
            gae_lambda=trpo_raw.get("gae_lambda", 1.0),
            cg_iters=trpo_raw.get("cg_iters", 10),
            backtrack_ratio=trpo_raw.get("backtrack_ratio", 0.8),
            max_backtracks=trpo_raw.get("max_backtracks", 15),
            reg_coeff=trpo_raw.get("reg_coeff", 1e-5),
        ),
        vpg=VpgParams(
            init_std=vpg_raw.get("init_std", 1.0),
            discount=vpg_raw.get("discount", 1.0),
            batch_size=vpg_raw.get("batch_size", 50000),
            reset=bool(vpg_raw.get("reset", True)),
            learning_rate=vpg_raw.get("learning_rate", 1e-3),
            gae_lambda=vpg_raw.get("gae_lambda", 1.0),
        ),
        batch_size=pop_raw.get("batch_size", 500),
        sam_mode=pop_raw.get("sam_mode", "step_rand"),
        remat=bool(pop_raw.get("remat", False)),
        rollout_unroll=int(pop_raw.get("rollout_unroll", 2)),
        step_rand_impl=str(pop_raw.get("step_rand_impl", "all_k")),
    )

    rp_raw = raw.get("rollout_params", {})
    exp_raw = rp_raw.get("exploration", {})
    rp = RolloutParams(
        training_data_size=rp_raw.get("training_data_size", 100000),
        validation_data_size=rp_raw.get("validation_data_size", 50000),
        split_ratio=rp_raw.get("split_ratio", 1.0 / 3.0),
        splitting_mode=rp_raw.get("splitting_mode", "trajectory"),
        use_same_dataset=bool(rp_raw.get("use_same_dataset", True)),
        exploration=ExplorationParams(
            initial_param_std=exp_raw.get("initial_param_std", 0.0),
            param_noise=exp_raw.get("param_noise", 1.0),
            action_noise=exp_raw.get("action_noise", 1.0),
            vary_trajectory_noise=bool(exp_raw.get("vary_trajectory_noise", False)),
        ),
        datapath=rp_raw.get("datapath", ""),
        is_monitored=bool(rp_raw.get("is_monitored", False)),
        monitorpath=rp_raw.get("monitorpath", ""),
        max_timestep=rp_raw.get("max_timestep", 100),
        render_every=rp_raw.get("render_every"),
        load_rollout_data=bool(rp_raw.get("load_rollout_data", False)),
    )

    return ExperimentConfig(
        algo=raw.get("algo", "trpo"),
        env=raw.get("env", "point2D"),
        n_models=raw.get("n_models", 5),
        sample_size=raw.get("sample_size", 3000),
        sweep_iters=raw.get("sweep_iters", 100),
        seed=raw.get("seed", 0),
        tf_summary=bool(raw.get("tf_summary", False)),
        model_diag_every=int(raw.get("model_diag_every", 0) or 0),
        policy=pol,
        dynamics_model=dyn,
        dynamics_opt_params=dop,
        policy_opt_params=pop,
        rollout_params=rp,
    )


def load_config(path: str, overrides: Optional[dict] = None) -> ExperimentConfig:
    """Load a params JSON file, optionally merging a -replace style override."""
    with open(path) as f:
        raw = json.load(f)
    if overrides:
        update_dictionary(raw, overrides, strict=True)
    return config_from_dict(raw)


def default_params_path(env_name: str) -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "params", f"params-{env_name}.json")


def config_to_dict(cfg: ExperimentConfig) -> dict:
    """Serialize back to a plain JSON-compatible dict (for snapshot dirs)."""

    def enc(obj):
        if dataclasses.is_dataclass(obj):
            return {k: enc(v) for k, v in dataclasses.asdict(obj).items()}
        if isinstance(obj, tuple):
            return [enc(v) for v in obj]
        return obj

    return enc(cfg)
