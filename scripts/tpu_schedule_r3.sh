#!/bin/bash
# Round-3 sequential TPU schedule (ONE exclusive chip — jobs must never
# overlap). Start the preservation sidecar FIRST so every completed sweep
# is committed (machine resets drop uncommitted files — see CLAUDE.md):
#
#   nohup bash scripts/preserve_loop.sh 240 runs/ant_ref runs/swimmer_s1 \
#       runs/swimmer_s2 runs/cheetah_r3 runs/hopper_r3 runs/snake_r3 \
#       runs/humanoid_r3 runs/swimmer_s0 > runs/preserve_loop.log 2>&1 &
#   nohup bash scripts/tpu_schedule_r3.sh > runs/schedule_r3.log 2>&1 &
#
# Priority order = round-2 VERDICT: ant resume + swimmer seed variance
# first (small, each run fully closes an item), then the long cheetah
# drive toward a plateau, then the never-trained hopper/snake/humanoid.
# A global deadline frees the chip before the driver's end-of-round
# bench; every stage resumes from per-sweep ckpts (or the committed
# resume-light.ckpt after a reset), so re-running this script continues
# where it stopped.
cd /root/repo

DEADLINE_S="${DEADLINE_S:-25500}"   # 7h05m of chip from script start
START=$(date +%s)

stage() {
    local name="$1" budget="$2"; shift 2
    local now elapsed left t
    now=$(date +%s); elapsed=$((now - START)); left=$((DEADLINE_S - elapsed))
    if [ "$left" -lt 300 ]; then
        echo "[schedule] SKIP $name (deadline: ${left}s left)"
        return
    fi
    t=$((budget < left ? budget : left))
    echo "[schedule] $name start $(date +%T) (timeout ${t}s)"
    timeout "$t" "$@" > "runs/${name}.out" 2>&1
    echo "[schedule] $name rc=$? end $(date +%T)"
}

R="python -m metrpo_tpu.run trpo"

stage ant_r3      3600 $R -env ant -seed 0 -yes -sweeps 17 -resume \
                       -snapshot-dir runs/ant_ref
stage swimmer_s1  2700 $R -env swimmer -seed 1 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s1
stage swimmer_s2  2700 $R -env swimmer -seed 2 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s2
# cheetah: round-2 ckpts were lost to a machine reset (figure evidence
# reached sweep 76 / return 240); restart fresh under the sidecar so a
# reset (or round 4) resumes instead of restarting. sweep_iters = the
# reference's 100-sweep budget.
stage cheetah_r3 13500 $R -env half-cheetah -seed 0 -yes -resume \
                       -snapshot-dir runs/cheetah_r3
stage hopper_r3   2700 $R -env hopper -seed 0 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/hopper_r3
stage snake_r3    2400 $R -env snake -seed 0 -yes -sweeps 10 -resume \
                       -snapshot-dir runs/snake_r3
# humanoid smoke at reduced policy-opt scale (VERDICT r2 item 7 sanctions
# "a few sweeps at reduced scale" — the reference calls humanoid its
# hardest env, order-days on a GPU)
stage humanoid_r3 2400 $R -env humanoid -seed 0 -yes -sweeps 4 -resume \
                       -snapshot-dir runs/humanoid_r3 \
                       -replace '{"policy_opt_params": {"max_iters": 100}}'
stage swimmer_s0  2700 $R -env swimmer -seed 0 -yes -sweeps 14 -resume \
                       -snapshot-dir runs/swimmer_s0
echo "[schedule] all done $(date +%T)"
