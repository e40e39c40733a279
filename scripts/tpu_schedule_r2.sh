#!/bin/bash
# Round-2 sequential TPU schedule (ONE exclusive chip — jobs must not overlap).
# Each stage under timeout; per-sweep ckpts make every stage resumable.
#   nohup bash scripts/tpu_schedule_r2.sh > runs/schedule_r2.log 2>&1 &
cd /root/repo
# do NOT overwrite PYTHONPATH: /root/.axon_site must stay on it for the
# axon TPU backend to register; `python -m` from the repo root already
# puts the package on sys.path.

echo "[schedule] cheetah full-scale start $(date +%T)"
timeout 9000 python -m metrpo_tpu.run trpo -env half-cheetah -seed 0 -yes \
    -resume -snapshot-dir runs/cheetah_ref > runs/cheetah_ref.out 2>&1
echo "[schedule] cheetah rc=$? end $(date +%T)"

echo "[schedule] swimmer start $(date +%T)"
timeout 3600 python -m metrpo_tpu.run trpo -env swimmer -seed 0 -yes \
    -sweeps 40 -resume -snapshot-dir runs/swimmer_ref > runs/swimmer_ref.out 2>&1
echo "[schedule] swimmer rc=$? end $(date +%T)"

echo "[schedule] ant start $(date +%T)"
timeout 3000 python -m metrpo_tpu.run trpo -env ant -seed 0 -yes \
    -sweeps 30 -resume -snapshot-dir runs/ant_ref > runs/ant_ref.out 2>&1
echo "[schedule] ant rc=$? end $(date +%T)"

echo "[schedule] all done $(date +%T)"
