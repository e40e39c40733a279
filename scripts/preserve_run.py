"""Preserve a run's evidence + resumability in git across machine resets.

Round-2 lesson: per-sweep checkpoints and progress.csv live only on local
disk; a machine reset restores /root/repo from git and everything
uncommitted is gone (this cost us the cheetah sweep-33..76 CSV — only the
committed figure survived). This tool snapshots the minimum needed to
(a) prove the learning curve and (b) resume training next round:

  * copies progress.csv -> progress.csv  (already tracked-sized)
  * writes resume-light.ckpt: the latest policy-and-models-*.ckpt with
    the replay buffers stripped (tens of kB..MB instead of 100s of MB;
    Trainer.load_state_dict tolerates the missing "replay" key — resumed
    runs refill replay from fresh collection sweeps)

Usage:  python scripts/preserve_run.py runs/ant_ref [runs/other ...]
Then `git add runs/<name>/progress.csv runs/<name>/resume-light.ckpt`.

CPU-only (never touches the TPU): safe to run while a chip job is live.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # never grab the exclusive TPU

from metrpo_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)


def preserve(run_dir: str) -> None:
    log_dir = os.path.join(run_dir, "training_logs")
    ckpt = latest_checkpoint(log_dir, "policy-and-models")
    if ckpt is None:
        final = os.path.join(log_dir, "policy-and-models-final.ckpt")
        ckpt = final if os.path.isfile(final) else None
    if ckpt is None:
        print(f"{run_dir}: no checkpoint found (nothing to strip)")
        return
    state = load_checkpoint(ckpt)
    state.pop("replay", None)
    out = os.path.join(run_dir, "resume-light.ckpt")
    save_checkpoint(out, state)
    print(f"{run_dir}: {os.path.basename(ckpt)} (sweep {state.get('count')}) "
          f"-> resume-light.ckpt ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    for d in sys.argv[1:] or ["runs/ant_ref"]:
        preserve(d)
