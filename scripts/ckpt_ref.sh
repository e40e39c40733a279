#!/bin/bash
# Checkpoint storage at CSV-scale git growth (VERDICT r4 weak #6 / next #9).
#
# Instead of committing ~22 MB resume-light.ckpt blobs to main history at
# every stage end (unbounded growth across rounds), store the blob on a
# replace-in-place custom ref refs/ckpts/<run-name> (parentless commit;
# each store REPLACES the previous one, whose objects become unreachable
# and are dropped by `git prune --expire=now`), and commit only a tiny
# .sha256 sidecar to main so the evidence trail stays auditable.
#
#   bash scripts/ckpt_ref.sh store   runs/ant_ref   # after preserve_run.py
#   bash scripts/ckpt_ref.sh restore runs/ant_ref   # before a -resume stage
#
# restore: if the on-disk resume-light.ckpt is missing or does not match
# the committed sidecar sha (e.g. a machine reset re-checked-out the stale
# tracked copy from an old round), extract the latest blob from the ref.
# If the ref itself is gone (fresh clone), leave whatever is on disk —
# -resume then degrades gracefully to the older tracked ckpt.
set -u
cd "${CKPT_REF_REPO:-/root/repo}"   # overridable for tests
op="${1:?store|restore}"; d="${2:?run dir}"
name=$(basename "$d"); f="$d/resume-light.ckpt"; side="$d/resume-light.sha256"
case "$op" in
store)
    [ -f "$f" ] || { echo "ckpt_ref: no $f"; exit 0; }
    blob=$(git hash-object -w "$f")
    tree=$(printf '100644 blob %s\tresume-light.ckpt\n' "$blob" | git mktree)
    commit=$(git commit-tree "$tree" -m "ckpt $name $(date +%F_%T)")
    git update-ref "refs/ckpts/$name" "$commit"
    sha256sum "$f" | awk '{print $1"  resume-light.ckpt"}' > "$side"
    echo "ckpt_ref: stored $name -> refs/ckpts/$name ($(stat -c%s "$f") B)"
    ;;
restore)
    git rev-parse -q --verify "refs/ckpts/$name" >/dev/null || exit 0
    want=$(awk '{print $1}' "$side" 2>/dev/null || true)
    have=""; [ -f "$f" ] && have=$(sha256sum "$f" | awk '{print $1}')
    if [ -n "$want" ] && [ "$want" != "$have" ]; then
        git cat-file blob "refs/ckpts/$name:resume-light.ckpt" > "$f"
        echo "ckpt_ref: restored $f from refs/ckpts/$name"
    fi
    ;;
*)  echo "ckpt_ref: unknown op $op"; exit 1;;
esac
