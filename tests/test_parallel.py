"""Sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrpo_tpu.parallel.mesh import (DATA_AXIS, ENSEMBLE_AXIS,
                                      data_sharding,
                                      ensemble_batch_sharding, make_mesh,
                                      replicate_tree, shard_tree_ensemble)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {DATA_AXIS: 4, ENSEMBLE_AXIS: 2}


def test_sharded_batch_reduction_matches_local():
    mesh = make_mesh(8, 1)
    x = np.random.randn(64, 16).astype(np.float32)
    xs = jax.device_put(x, data_sharding(mesh))
    out = jax.jit(lambda a: jnp.mean(jnp.square(a)))(xs)
    np.testing.assert_allclose(float(out), np.mean(x ** 2), rtol=1e-6)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    nxt, reward = out
    assert nxt.shape == (512, 18)
    assert reward.shape == (512,)


def test_multichip_step_matches_single_device():
    """The sharded full-train-step must produce the same metrics as the
    unsharded run (same program, different partitioning)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from metrpo_tpu.config import PolicyOptParams, TrpoParams
    from metrpo_tpu.parallel.training import make_multichip_train_step

    policy, ensemble, pp, ep, in_stats, diff_stats = g._build(
        n_models=4, dyn_hidden=(32,), pol_hidden=(8,))
    pop = PolicyOptParams(T=4, oracle_maxtimestep=4, batch_size=16,
                          trpo=TrpoParams(batch_size=64, cg_iters=3))
    rng = np.random.default_rng(0)
    D = g.CHEETAH_OBS + g.CHEETAH_ACT
    dyn_x = rng.normal(size=(4, 8, D)).astype(np.float32)
    dyn_y = rng.normal(size=(4, 8, g.CHEETAH_OBS)).astype(np.float32)
    inits = rng.normal(size=(16, g.CHEETAH_OBS)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    results = {}
    for tag, (nd, ne) in {"1dev": (1, 1), "8dev": (4, 2)}.items():
        devices = jax.devices()[: nd * ne]
        mesh = make_mesh(nd, ne, devices=devices)
        step, dyn_opt = make_multichip_train_step(
            policy, ensemble, g._cheetah_cost, pop, mesh)
        with mesh:
            ep_s = shard_tree_ensemble(mesh, ep)
            opt_state = dyn_opt.init(ep_s)
            out = step(replicate_tree(mesh, pp), ep_s, opt_state,
                       jax.device_put(dyn_x, ensemble_batch_sharding(mesh)),
                       jax.device_put(dyn_y, ensemble_batch_sharding(mesh)),
                       replicate_tree(mesh, in_stats),
                       replicate_tree(mesh, diff_stats),
                       jax.device_put(inits, data_sharding(mesh)), key)
        results[tag] = {k: float(v) for k, v in out[3].items()}

    for k in results["1dev"]:
        np.testing.assert_allclose(results["1dev"][k], results["8dev"][k],
                                   rtol=2e-3, atol=1e-5, err_msg=k)
