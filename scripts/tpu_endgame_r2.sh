#!/bin/bash
# Round-2 endgame on the exclusive chip: pallas win-or-delete bench, then
# resume the reference-scale cheetah run with the remaining wall-clock.
cd /root/repo

echo "[endgame] pallas bench start $(date +%T)"
timeout 1500 python scripts/bench_pallas.py > runs/pallas_r2.out 2>&1
echo "[endgame] pallas rc=$? end $(date +%T)"

echo "[endgame] ant resume start $(date +%T)"
timeout 2100 python -m metrpo_tpu.run trpo -env ant -seed 0 -yes -sweeps 30 \
    -resume -snapshot-dir runs/ant_ref > runs/ant_ref_resume.out 2>&1
echo "[endgame] ant rc=$? end $(date +%T)"
echo "[endgame] done $(date +%T)"
