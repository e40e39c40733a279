#!/bin/bash
# Round-5c chip schedule — short extension window after the round-5
# snapshot.  One stage only: hopper seed 1 from scratch, giving the last
# single-seed "reliable, order of hours" env a multi-seed plateau band
# (swimmer has 3 seeds, snake 2; hopper had only seed 0, runs/hopper_r3).
# Hard 25-min budget: hopper reached its plateau in ~30 min in round 3,
# and the chip must be free well before the driver's end-of-round bench.
#
#   nohup bash scripts/tpu_schedule_r5c.sh > runs/schedule_r5c.log 2>&1 &
cd /root/repo

DEADLINE_FILE=runs/r5_deadline.epoch
deadline() { cat "$DEADLINE_FILE" 2>/dev/null || echo 0; }

stage() {
    local name="$1" budget="$2" dir="$3" watch="$4"; shift 4
    local now left t pid
    now=$(date +%s); left=$(( $(deadline) - now ))
    if [ "$left" -lt 420 ]; then
        echo "[r5c] SKIP $name (deadline: ${left}s left)"
        return
    fi
    t=$((budget < left ? budget : left))
    echo "[r5c] $name start $(date +%T) (timeout ${t}s)"
    timeout "$t" "$@" > "runs/${name}.out" 2>&1 &
    pid=$!
    echo "$pid" >> runs/r5c_pids.txt
    while kill -0 "$pid" 2>/dev/null; do
        sleep 120
        now=$(date +%s)
        if [ "$now" -ge "$(deadline)" ]; then
            echo "[r5c] $name DEADLINE at $(date +%T) — freeing chip"
            kill "$pid" 2>/dev/null
            break
        fi
        if [ "$watch" != "none" ]; then
            local ws; IFS=: read -ra ws <<< "$watch"
            if nice -n 19 python scripts/plateau_check.py "$dir" \
                    "${ws[0]}" "${ws[1]}" "${ws[2]}" 2>/dev/null; then
                echo "[r5c] $name PLATEAU at $(date +%T) — freeing chip"
                kill "$pid" 2>/dev/null
                break
            fi
        fi
    done
    wait "$pid"
    echo "[r5c] $name rc=$? end $(date +%T)"
    nice -n 19 python scripts/preserve_run.py "$dir" >/dev/null 2>&1
    bash scripts/ckpt_ref.sh store "$dir"
    local paths=() f
    for f in progress.csv resume-light.sha256 params.json info.log; do
        [ -f "$dir/$f" ] && paths+=("$dir/$f")
    done
    [ ${#paths[@]} -eq 0 ] && return
    git add -f "${paths[@]}" 2>/dev/null
    git diff --cached --quiet -- "${paths[@]}" || git commit -q -m \
        "Stage end: $name evidence (hopper second seed)

No-Verification-Needed: run-evidence snapshot, no product code" -- "${paths[@]}"
}

R="python -m metrpo_tpu.run trpo"

stage hopper_s1 1500 runs/hopper_s1 10:4:0.05 \
    $R -env hopper -seed 1 -yes -sweeps 13 -snapshot-dir runs/hopper_s1
echo "[r5c] all done $(date +%T)"
