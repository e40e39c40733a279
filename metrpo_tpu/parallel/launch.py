"""Multi-host launch helpers.

The reference's only multi-machine story was N independent EC2 seeds
(``run_model_based_rl.py:147-169``).  Here multi-host = one training run
spanning a pod slice: ``jax.distributed.initialize`` per host, a global
``(data, ensemble)`` mesh over all devices, host-local real-env stepping
(each host steps its own env shard), and XLA collectives over ICI/DCN for
every reduction (SURVEY.md §5.8 target design).

The host side is SPMD: every process runs the same host code with the
same seeds, so host-side arrays are identical everywhere and
``parallel/mesh.py:put_global`` feeds each process only the shards its
local devices address.  Validated end-to-end by the 2-process
``jax.distributed`` CPU test driving one production ``Trainer.run_sweep``
(``tests/test_parallel.py::test_two_process_distributed_sweep``).

Usage on each host of a slice:

    python -m metrpo_tpu.parallel.launch --coordinator <host0>:1234 \
        --num-hosts N --host-id i -- trpo -env half-cheetah
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op on single host / TPU pods with
    auto-bootstrap metadata)."""
    if coordinator is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host / already initialized
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-id", type=int, default=None)
    p.add_argument("run_args", nargs=argparse.REMAINDER,
                   help="args forwarded to metrpo_tpu.run (after --)")
    args = p.parse_args()
    pid, n = initialize_distributed(args.coordinator, args.num_hosts,
                                    args.host_id)
    print(f"host {pid}/{n}, {len(jax.devices())} global devices, "
          f"{len(jax.local_devices())} local")

    run_args = [a for a in args.run_args if a != "--"]
    from metrpo_tpu.run import main as run_main
    run_main(run_args)


if __name__ == "__main__":
    main()
