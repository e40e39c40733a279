#!/bin/bash
# Evidence-preservation sidecar: every INTERVAL seconds, snapshot the given
# run dirs' progress.csv (+ params.json / info.log) and commit; every
# CKPT_EVERY-th interval also refresh the replay-stripped
# resume-light.ckpt ON DISK — but never commit it from here.  Ckpt blobs
# (~20 MB each) re-committed every few ticks grew .git to 333 MB in
# round 3 (VERDICT r3 weak #7); the ckpt is now committed ONCE per run,
# at stage end, by the schedule script (see tpu_schedule_r4.sh stage()).
# A machine reset mid-stage therefore loses at most that stage's
# resumability (previous stage-end ckpt is still in git) while the
# evidence CSVs stay committed at CSV-scale git growth.
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
            nice -n 19 python scripts/preserve_run.py "$d" >/dev/null 2>&1
            # Mid-stage resumability at zero main-history cost: park the
            # refreshed ckpt on the replace-in-place ref too.  Round 5's
            # machine reset lost ant sweeps 76-133 of state because the
            # on-disk refresh was never committed anywhere (the ref was
            # only stored at stage end, which the reset preempted).
            bash scripts/ckpt_ref.sh store "$d" >/dev/null 2>&1
        fi
        for f in progress.csv params.json info.log; do
            [ -f "$d/$f" ] && PATHS+=("$d/$f")
        done
    done
    [ ${#PATHS[@]} -eq 0 ] && continue
    git add -f "${PATHS[@]}" 2>/dev/null
    if ! git diff --cached --quiet -- "${PATHS[@]}"; then
        git commit -q -m "Preserve run evidence ($(date +%H:%M))

No-Verification-Needed: evidence-CSV snapshot, no product code" \
            -- "${PATHS[@]}"
        echo "[preserve] committed $(date +%T)"
    fi
done
