#!/bin/bash
# Evidence-preservation sidecar: every INTERVAL seconds, snapshot the given
# run dirs (progress.csv + replay-stripped resume-light.ckpt) and commit.
# CPU-only (preserve_run.py pins jax to cpu) — safe while the chip is busy.
#
#   nohup bash scripts/preserve_loop.sh 300 runs/ant_ref runs/cheetah_r3 \
#       > runs/preserve_loop.log 2>&1 &
cd /root/repo
INTERVAL="${1:-300}"
shift
DIRS=("$@")
[ ${#DIRS[@]} -eq 0 ] && DIRS=(runs/ant_ref)

while true; do
    sleep "$INTERVAL"
    changed=0
    for d in "${DIRS[@]}"; do
        [ -f "$d/progress.csv" ] || continue
        python scripts/preserve_run.py "$d" >/dev/null 2>&1
        git add -f "$d/progress.csv" "$d/resume-light.ckpt" "$d/params.json" \
            2>/dev/null
        changed=1
    done
    if [ "$changed" = 1 ] && ! git diff --cached --quiet; then
        git commit -q -m "Preserve run evidence ($(date +%H:%M): ${DIRS[*]})"
        echo "[preserve] committed $(date +%T)"
    fi
done
