#!/bin/bash
# Round-3 schedule, revision B: replaces tpu_schedule_r3.sh mid-round
# (the original's stage budgets would have skipped snake/humanoid/
# swimmer_s0 entirely). Waits for the in-flight ant stage, then runs the
# short high-information stages FIRST (swimmer seed variance, humanoid
# smoke, hopper, snake — each fully closes a VERDICT r2 item) and gives
# cheetah everything that remains before the absolute deadline, resuming
# from its per-sweep ckpts next round.
#
#   nohup bash scripts/tpu_schedule_r3b.sh <ant_pid> <deadline_epoch> \
#       > runs/schedule_r3b.log 2>&1 &
cd /root/repo

ANT_PID="${1:?ant pid}"
DEADLINE_EPOCH="${2:?deadline epoch}"

while kill -0 "$ANT_PID" 2>/dev/null; do sleep 20; done
echo "[schedule-b] ant done $(date +%T)"

stage() {
    local name="$1" budget="$2"; shift 2
    local now left t
    now=$(date +%s); left=$((DEADLINE_EPOCH - now))
    if [ "$left" -lt 300 ]; then
        echo "[schedule-b] SKIP $name (deadline: ${left}s left)"
        return
    fi
    t=$((budget < left ? budget : left))
    echo "[schedule-b] $name start $(date +%T) (timeout ${t}s)"
    timeout "$t" "$@" > "runs/${name}.out" 2>&1
    echo "[schedule-b] $name rc=$? end $(date +%T)"
}

R="python -m metrpo_tpu.run trpo"

stage swimmer_s1  2700 $R -env swimmer -seed 1 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s1
stage swimmer_s2  2700 $R -env swimmer -seed 2 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s2
# humanoid smoke at reduced policy-opt scale (VERDICT r2 item 7 sanctions
# "a few sweeps at reduced scale" — the reference calls humanoid its
# hardest env, order-days on a GPU)
stage humanoid_r3 1800 $R -env humanoid -seed 0 -yes -sweeps 4 -resume \
                       -snapshot-dir runs/humanoid_r3 \
                       -replace '{"policy_opt_params": {"max_iters": 100}}'
stage hopper_r3   2400 $R -env hopper -seed 0 -yes -sweeps 13 -resume \
                       -snapshot-dir runs/hopper_r3
stage snake_r3    2100 $R -env snake -seed 0 -yes -sweeps 10 -resume \
                       -snapshot-dir runs/snake_r3
# cheetah: round-2 ckpts were lost to a machine reset; restart fresh
# under the sidecar (sweep_iters = the reference's 100-sweep budget) and
# let it use every remaining deadline second — per-sweep ckpts +
# resume-light.ckpt make it resumable next round.
NOW=$(date +%s); LEFT=$((DEADLINE_EPOCH - NOW))
stage cheetah_r3 "$LEFT" $R -env half-cheetah -seed 0 -yes -resume \
                       -snapshot-dir runs/cheetah_r3
stage swimmer_s0  2700 $R -env swimmer -seed 0 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s0
echo "[schedule-b] all done $(date +%T)"
