"""Worker for the 2-process jax.distributed test (multi-controller mode).

Spawned by tests/test_parallel.py::test_two_process_distributed_sweep:
two of these processes, each owning 2 virtual CPU devices, form one
4-device (2 data x 2 ensemble) global mesh and drive ONE production
Trainer.run_sweep (collect -> ensemble fit -> TRPO with the ensemble
vote).  The host side is SPMD: both processes run identical host code
with identical seeds, so every host-side array is identical and
parallel/mesh.py's put_global feeds each process's addressable shards
(SURVEY.md §5.8; the reference's only multi-machine analog was N
independent EC2 seeds, run_model_based_rl.py:147-169).

Usage: python tests/mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_metrpo_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as g  # noqa: E402
from metrpo_tpu.config import config_from_dict  # noqa: E402
from metrpo_tpu.envs.point2d import Point2DEnv  # noqa: E402
from metrpo_tpu.orchestrator import Trainer  # noqa: E402
from metrpo_tpu.parallel.mesh import make_mesh  # noqa: E402
from metrpo_tpu.utils.tree import tree_flatten_vector  # noqa: E402


def main():
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc
    mesh = make_mesh(nproc, 2)  # (data=nproc, ensemble=2) over 2*nproc devs
    cfg = config_from_dict(g.dryrun_multichip_config(2 * nproc))
    np.random.seed(0)
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv,
                      snapshot_dir=os.path.join(outdir, f"proc{pid}"),
                      mesh=mesh)
    res = trainer.run_sweep()
    out = {
        "process": pid,
        "real_cost": float(res["real_current_validation_cost"]),
        "n_policy_updates": int(res["policy_logs"]["n_policy_updates"]),
        "n_model_updates": int(
            res["dynamics_logs"]["training_dynamics"]["n_updates"]),
        "dyn_val": [float(v) for v in res["dynamics_logs"]
                    ["training_dynamics"]["final_validation_losses"]],
        "policy_l2": float(np.linalg.norm(
            np.asarray(tree_flatten_vector(trainer.policy_params)))),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc {pid} done: {out}", flush=True)


if __name__ == "__main__":
    main()
