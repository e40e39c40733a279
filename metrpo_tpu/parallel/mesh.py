"""Device mesh + sharding helpers.

The scale-out design (BASELINE.json north star, SURVEY.md §5.8): a mesh
with axes ``(data, ensemble)`` — imagined-rollout particles and dynamics
minibatches shard over ``data`` (DP), ensemble members shard over
``ensemble`` (EP, the K-member analog of expert parallelism).  We annotate
shardings on jit boundaries and let XLA/GSPMD insert the ``psum``-family
collectives (gradient reductions, CG Fisher-vector products, eval means)
over ICI; there is no hand-written NCCL/MPI analog.

The reference has no comm backend at all (rllab fork pools + independent
EC2 seeds, ``samplers/batch_sampler.py:16-41``, ``run_model_based_rl.py:147-169``);
this module is the from-scratch TPU-native replacement.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ENSEMBLE_AXIS = "ensemble"


def make_mesh(n_data: Optional[int] = None, n_ensemble: int = 1,
              devices=None) -> Mesh:
    """Build a (data, ensemble) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_ensemble
    assert n_data * n_ensemble == n, (
        f"mesh {n_data}x{n_ensemble} != {n} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_ensemble)
    return Mesh(dev_array, (DATA_AXIS, ENSEMBLE_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch/particle) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def ensemble_batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """(K, B, ...) arrays: members over ensemble, batch over data."""
    return NamedSharding(mesh, P(ENSEMBLE_AXIS, DATA_AXIS, *([None] * (ndim - 2))))


def ensemble_param_sharding(mesh: Mesh):
    """Shard every ensemble-param leaf's leading K axis over the ensemble
    axis (replicated over data)."""
    def spec(leaf):
        return NamedSharding(mesh, P(ENSEMBLE_AXIS, *([None] * (leaf.ndim - 1))))
    return spec


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_tree_ensemble(mesh: Mesh, params):
    """device_put ensemble params with K-axis sharded over 'ensemble'."""
    spec_of = ensemble_param_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, spec_of(l)), params)


def replicate_tree(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), tree)
