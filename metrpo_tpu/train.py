"""Experiment setup: config -> env -> Trainer -> sweep loop.

The in-tree analog of reference ``training.py:17-411`` ``train(variant)``:
seeds RNGs, snapshots params.json into the run dir, builds the env/policy/
ensemble, and drives ``train_models``-equivalent sweeps.  Unlike the
reference it never deletes the experiment directory on failure
(``training.py:403-411`` rmtree) — crashes leave checkpoints behind for
restart (resume via ``Trainer.load_state_dict`` on the latest ckpt).
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Optional

import numpy as np

from metrpo_tpu.config import ExperimentConfig, config_to_dict
from metrpo_tpu.envs import get_env
from metrpo_tpu.orchestrator import Trainer
from metrpo_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from metrpo_tpu.utils.prng import set_global_seeds


def make_snapshot_dir(cfg: ExperimentConfig, base: str = "data/local") -> str:
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    d = os.path.join(base, cfg.env, f"{cfg.env}_{stamp}_{cfg.seed}")
    os.makedirs(d, exist_ok=True)
    return d


def train(cfg: ExperimentConfig,
          snapshot_dir: Optional[str] = None,
          sweep_iters: Optional[int] = None,
          resume: bool = False) -> Trainer:
    set_global_seeds(cfg.seed)
    if snapshot_dir is None:
        snapshot_dir = make_snapshot_dir(cfg)
    os.makedirs(snapshot_dir, exist_ok=True)
    with open(os.path.join(snapshot_dir, "params.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, sort_keys=True, indent=4,
                  separators=(",", ": "))

    env = get_env(cfg.env, seed=cfg.seed)
    env_factory = lambda: get_env(cfg.env, seed=cfg.seed)
    trainer = Trainer(cfg, env, env_factory, snapshot_dir=snapshot_dir,
                      resume=resume)

    if resume:
        ckpt = latest_checkpoint(trainer.log_dir, "policy-and-models")
        if ckpt is None:
            # replay-stripped snapshot committed to git for cross-machine
            # resume (scripts/preserve_run.py); lives at the snapshot-dir
            # root because training_logs/ is gitignored. Replay refills
            # from the next collection sweeps.
            light = os.path.join(snapshot_dir, "resume-light.ckpt")
            ckpt = light if os.path.isfile(light) else None
        if ckpt:
            trainer.load_state_dict(load_checkpoint(ckpt))
            trainer.logger.info("Resumed from %s (sweep %d)", ckpt, trainer.count)

    n = sweep_iters if sweep_iters is not None else cfg.sweep_iters
    n = max(n - trainer.count, 0)
    trainer.train(sweep_iters=n)
    return trainer


def maybe_extend_sweeps(trainer, interactive: bool, chunk: int = 5,
                        input_fn=input) -> int:
    """Interactive sweep extension: after training completes, offer to keep
    going in ``chunk``-sweep increments (reference parity:
    ``model_based_rl.py:739-749`` asks "Do you want to continue training
    the policy?" after the sweep budget is spent). Non-interactive runs
    (scripts, fleets, CI) skip the prompt; ``-resume`` with a larger
    ``-sweeps`` covers the same need offline. Returns extra sweeps run."""
    extra = 0
    while interactive:
        try:
            ans = input_fn(f"Training done after {trainer.count} sweeps. "
                           f"Run {chunk} more? [y/N] ")
        except EOFError:
            break
        if ans.strip().lower() not in ("y", "yes"):
            break
        trainer.train(sweep_iters=chunk)
        extra += chunk
    return extra
