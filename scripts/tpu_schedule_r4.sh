#!/bin/bash
# Round-4 chip schedule (VERDICT r3 items 1-3):
#   1. snake_r4   — fresh run on the re-authored reference-regime physics
#                   (frame_skip 50 / Euler 0.001 / raw +-50 torques)
#   2. humanoid_r4 — full-scale (NOT max_iters-reduced) fresh run
#   3. ant_ref    — resume to plateau with every remaining second
# Each stage ends by committing its progress.csv AND one replay-stripped
# resume-light.ckpt (the ONLY ckpt commit per stage — VERDICT r3 weak #7;
# the preserve_loop sidecar now commits CSVs only).
#
#   nohup bash scripts/tpu_schedule_r4.sh <deadline_epoch> \
#       > runs/schedule_r4.log 2>&1 &
cd /root/repo

DEADLINE_EPOCH="${1:?deadline epoch}"

stage() {
    local name="$1" budget="$2" dir="$3"; shift 3
    local now left t
    now=$(date +%s); left=$((DEADLINE_EPOCH - now))
    if [ "$left" -lt 300 ]; then
        echo "[schedule-r4] SKIP $name (deadline: ${left}s left)"
        return
    fi
    t=$((budget < left ? budget : left))
    echo "[schedule-r4] $name start $(date +%T) (timeout ${t}s)"
    timeout "$t" "$@" > "runs/${name}.out" 2>&1
    echo "[schedule-r4] $name rc=$? end $(date +%T)"
    # stage-end evidence: CSV + ONE ckpt commit for this stage
    nice -n 19 python scripts/preserve_run.py "$dir" >/dev/null 2>&1
    local paths=()
    for f in progress.csv resume-light.ckpt params.json info.log; do
        [ -f "$dir/$f" ] && paths+=("$dir/$f")
    done
    [ ${#paths[@]} -eq 0 ] && return
    git add -f "${paths[@]}" 2>/dev/null
    git diff --cached --quiet -- "${paths[@]}" || git commit -q -m \
        "Stage end: $name evidence + resume ckpt

No-Verification-Needed: run-evidence snapshot, no product code" -- "${paths[@]}"
}

R="python -m metrpo_tpu.run trpo"

stage snake_r4    9000 runs/snake_r4    $R -env snake -seed 0 -yes \
                       -snapshot-dir runs/snake_r4
stage humanoid_r4 5400 runs/humanoid_r4 $R -env humanoid -seed 0 -yes \
                       -snapshot-dir runs/humanoid_r4
NOW=$(date +%s); LEFT=$((DEADLINE_EPOCH - NOW))
stage ant_ref  "$LEFT" runs/ant_ref     $R -env ant -seed 0 -yes -resume \
                       -sweeps 100 -snapshot-dir runs/ant_ref
echo "[schedule-r4] all done $(date +%T)"
