#!/bin/bash
# Round-3 sequential TPU schedule (ONE exclusive chip — jobs must not
# overlap). Start the preservation sidecar FIRST so every completed sweep
# is committed (machine resets drop uncommitted files — see CLAUDE.md):
#
#   nohup bash scripts/preserve_loop.sh 300 runs/ant_ref runs/cheetah_r3 \
#       > runs/preserve_loop.log 2>&1 &
#   nohup bash scripts/tpu_schedule_r3.sh > runs/schedule_r3.log 2>&1 &
#
# Budgets assume ~55 min of chip; trim timeouts to the round's remaining
# wall-clock. Every stage resumes from per-sweep ckpts (or the committed
# resume-light.ckpt after a reset).
cd /root/repo

echo "[schedule] ant resume start $(date +%T)"
timeout 1500 python -m metrpo_tpu.run trpo -env ant -seed 0 -yes \
    -sweeps 30 -resume -snapshot-dir runs/ant_ref > runs/ant_ref.out 2>&1
echo "[schedule] ant rc=$? end $(date +%T)"

# cheetah's round-2 ckpts were lost to a machine reset (figure evidence
# reached sweep 76 / return 240); restart under the sidecar so round 4+
# resumes instead of restarting
echo "[schedule] cheetah restart $(date +%T)"
timeout 1500 python -m metrpo_tpu.run trpo -env half-cheetah -seed 0 -yes \
    -resume -snapshot-dir runs/cheetah_r3 > runs/cheetah_r3.out 2>&1
echo "[schedule] cheetah rc=$? end $(date +%T)"
echo "[schedule] all done $(date +%T)"
