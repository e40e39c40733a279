#!/bin/bash
# Evidence-preservation sidecar: every INTERVAL seconds, snapshot the given
# run dirs' progress.csv and commit; every CKPT_EVERY-th interval also
# refresh the replay-stripped resume-light.ckpt (it is a ~20 MB blob per
# commit, so it is snapshotted far less often than the CSV).
# CPU-only (preserve_run.py pins jax to cpu) — safe while the chip is busy.
# Commits name their paths explicitly so unrelated staged work from a
# concurrent session is never swept into a preserve commit.
#
#   nohup bash scripts/preserve_loop.sh 240 runs/ant_ref runs/cheetah_r3 \
#       > runs/preserve_loop.log 2>&1 &
cd /root/repo
INTERVAL="${1:-240}"
CKPT_EVERY="${CKPT_EVERY:-10}"
shift
DIRS=("$@")
[ ${#DIRS[@]} -eq 0 ] && DIRS=(runs/ant_ref)

tick=0
while true; do
    sleep "$INTERVAL"
    tick=$((tick + 1))
    PATHS=()
    for d in "${DIRS[@]}"; do
        [ -f "$d/progress.csv" ] || continue
        if [ $((tick % CKPT_EVERY)) -eq 0 ]; then
            python scripts/preserve_run.py "$d" >/dev/null 2>&1
        fi
        for f in progress.csv resume-light.ckpt params.json info.log; do
            [ -f "$d/$f" ] && PATHS+=("$d/$f")
        done
    done
    [ ${#PATHS[@]} -eq 0 ] && continue
    git add -f "${PATHS[@]}" 2>/dev/null
    if ! git diff --cached --quiet -- "${PATHS[@]}"; then
        git commit -q -m "Preserve run evidence ($(date +%H:%M))" \
            -- "${PATHS[@]}"
        echo "[preserve] committed $(date +%T)"
    fi
done
