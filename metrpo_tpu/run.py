"""CLI launcher.

In-tree analog of reference ``run_model_based_rl.py:54-184``:

    python -m metrpo_tpu.run trpo -env half-cheetah -seed 5 \
        -replace '{"policy_opt_params": {"max_iters": 100}}'

Loads params/params-<env>.json, applies a ``-replace`` dict override
(strict key checking, ``ast.literal_eval`` instead of the reference's
``eval``), guards algo/env mismatches against the JSON, and runs N seeds
sequentially in-process (the reference's ``-n N`` launched N EC2
instances; multi-seed fleet parallelism here is one process per seed or a
pod slice per seed — see parallel/).
"""

from __future__ import annotations

import argparse
import ast
import os
import sys

from metrpo_tpu.config import (default_params_path, load_config,
                               update_dictionary)

ALGOS = ("trpo", "vpg", "bptt", "bptt-stochastic", "svg", "l-bfgs", "ppo",
         "npg")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native ME-TRPO")
    p.add_argument("algo", type=str, choices=ALGOS)
    p.add_argument("-env", type=str, default=None,
                   help="env name (params/params-<env>.json must exist)")
    p.add_argument("-params", type=str, default=None,
                   help="explicit params JSON path")
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-n", type=int, default=1, help="number of seeds")
    p.add_argument("-replace", type=str, default=None,
                   help="python dict literal merged over the JSON config")
    p.add_argument("-sweeps", type=int, default=None,
                   help="override sweep_iters")
    p.add_argument("-snapshot-dir", type=str, default=None)
    p.add_argument("-resume", action="store_true")
    p.add_argument("-yes", action="store_true",
                   help="skip interactive algo/env mismatch confirmation")
    p.add_argument("-profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    p.add_argument("-parallel", action="store_true",
                   help="run the -n seeds as concurrent processes (the "
                        "TPU-native analog of the reference's N EC2 "
                        "instances, run_model_based_rl.py:147-169); "
                        "requires a platform where processes don't contend "
                        "for one exclusive chip (use -platform cpu, or one "
                        "process per pod slice)")
    p.add_argument("-platform", type=str, default=None,
                   help="force the jax platform (e.g. 'cpu') before "
                        "backend init — the env var alone is overridden "
                        "by site customizations on some images")
    return p


def _launch_seed_fleet(args, argv) -> int:
    """Spawn one subprocess per seed and wait (fleet parallelism)."""
    import subprocess
    if args.platform is None:
        # N children sharing one exclusive accelerator deadlock silently;
        # require an explicit platform choice so the hazard is opt-in
        # (e.g. '-platform cpu', or '-platform tpu' on a pod slice where
        # each process owns its own chips).
        sys.exit("-parallel needs -platform: N concurrent processes on a "
                 "single exclusive accelerator deadlock. Use '-platform "
                 "cpu' or run one process per device slice.")
    base_dir = args.snapshot_dir
    procs = []
    for i in range(args.n):
        seed = args.seed + i
        child = [sys.executable, "-m", "metrpo_tpu.run", args.algo,
                 "-seed", str(seed), "-n", "1", "-yes"]
        if args.env:
            child += ["-env", args.env]
        if args.params:
            child += ["-params", args.params]
        if args.replace:
            child += ["-replace", args.replace]
        if args.sweeps is not None:
            child += ["-sweeps", str(args.sweeps)]
        if args.platform:
            child += ["-platform", args.platform]
        if args.resume:
            child += ["-resume"]
        if args.profile:
            # per-seed trace dirs; the parent never profiles in fleet mode
            child += ["-profile", os.path.join(args.profile, f"seed_{seed}")]
        if base_dir:
            child += ["-snapshot-dir", os.path.join(base_dir, f"seed_{seed}")]
        procs.append((seed, subprocess.Popen(child)))
    rc = 0
    for seed, proc in procs:
        code = proc.wait()
        if code != 0:
            print(f"seed {seed} exited with {code}", file=sys.stderr)
            rc = code
    return rc


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Persistent compile cache: back-to-back runs with the same shapes
    # (seed fleets, resume-after-reset, the sequential TPU schedule) skip
    # recompilation. Honors an externally-set JAX_COMPILATION_CACHE_DIR.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_metrpo")
    path = args.params or default_params_path(args.env)
    if not os.path.exists(path):
        sys.exit(f"params file not found: {path}")

    if args.parallel and args.n > 1:
        rc = _launch_seed_fleet(args, argv)
        if rc:
            sys.exit(rc)
        return

    overrides = {}
    if args.replace:
        overrides = ast.literal_eval(args.replace)
        assert isinstance(overrides, dict), "-replace must be a dict literal"

    cfg = load_config(path, overrides=overrides or None)

    # algo/env mismatch guards (reference run_model_based_rl.py:99-128)
    if cfg.algo != args.algo:
        if not args.yes and sys.stdin.isatty():
            resp = input(
                f"Config algo is {cfg.algo!r} but CLI says {args.algo!r}. "
                f"Use {args.algo!r}? [y/N] ")
            if resp.lower() not in ("y", "yes"):
                sys.exit("aborted")
        import dataclasses
        cfg = dataclasses.replace(cfg, algo=args.algo)
    if args.env and cfg.env != args.env:
        sys.exit(f"Config env {cfg.env!r} != CLI env {args.env!r}")

    # l-bfgs runs a single full optimization per sweep
    if cfg.algo == "l-bfgs" and cfg.policy_opt_params.max_iters != 1:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, policy_opt_params=dataclasses.replace(
                cfg.policy_opt_params, max_iters=1))

    from metrpo_tpu.train import maybe_extend_sweeps, train
    import dataclasses
    import contextlib

    if args.profile:
        import jax
        profile_cm = jax.profiler.trace(args.profile)
    else:
        profile_cm = contextlib.nullcontext()

    with profile_cm:
        for i in range(args.n):
            seed_cfg = dataclasses.replace(cfg, seed=args.seed + i)
            trainer = train(seed_cfg, snapshot_dir=args.snapshot_dir,
                            sweep_iters=args.sweeps, resume=args.resume)
            # "run 5 more sweeps?" loop (model_based_rl.py:739-749);
            # only when a human is attached and for a single-seed run
            maybe_extend_sweeps(
                trainer,
                interactive=(args.n == 1 and not args.yes
                             and sys.stdin.isatty()))


if __name__ == "__main__":
    main()
