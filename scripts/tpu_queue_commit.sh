#!/bin/bash
# Artifact committer for the round-4 TPU queues: as queue jobs finish it
# syncs their logs into scripts/queue_logs_r04/ and commits them together
# with the in-repo artifacts the jobs write (TPU_PARITY_r04.md,
# bench_details.json, scripts/*_results.json), so chip results survive even
# if no builder session is alive when the relay comes back.
#
# Commits are path-scoped (git commit -- <paths>) so concurrent manual work
# in the tree is never swept into an automated commit.
cd /root/repo || exit 1
DEST=scripts/queue_logs_r04
mkdir -p "$DEST"
LOG=/tmp/tpu_queue_commit.log
: > "$LOG"

sync_and_commit() {
  local changed=0
  for f in /tmp/q[0-9]*_*.log; do
    [ -f "$f" ] || continue
    local base tgt
    base=$(basename "$f")
    tgt="$DEST/$base"
    # Keep each log bounded; re-copy when the source grew/changed.
    tail -c 200000 "$f" > "/tmp/.qsync_$base"
    if ! cmp -s "/tmp/.qsync_$base" "$tgt" 2>/dev/null; then
      mv "/tmp/.qsync_$base" "$tgt"
      changed=1
    else
      rm -f "/tmp/.qsync_$base"
    fi
  done
  for q in /tmp/tpu_queue.log /tmp/tpu_queue_r4b.log /tmp/tpu_queue_r4c.log; do
    [ -f "$q" ] || continue
    local base tgt
    base=$(basename "$q")
    tgt="$DEST/$base"
    grep -v "relay down; sleeping" "$q" | tail -c 50000 > "/tmp/.qsync_$base"
    if ! cmp -s "/tmp/.qsync_$base" "$tgt" 2>/dev/null; then
      mv "/tmp/.qsync_$base" "$tgt"
      changed=1
    else
      rm -f "/tmp/.qsync_$base"
    fi
  done

  local paths=("$DEST" TPU_PARITY_r04.md bench_details.json
               scripts/search_recall_results.json
               scripts/streaming_identify_mesh.json)
  local dirty=""
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    if [ -n "$(git status --porcelain -- "$p")" ]; then
      dirty="$dirty $p"
    fi
  done
  if [ -n "$dirty" ]; then
    git add -- $dirty
    git commit -q -m "TPU queue artifacts:$dirty

Auto-committed by scripts/tpu_queue_commit.sh as the round-4 on-chip
validation queue drains.

No-Verification-Needed: measurement artifacts only" -- $dirty \
      && echo "$(date '+%H:%M:%S') committed:$dirty" >> "$LOG"
  fi
}

while :; do
  sync_and_commit
  if [ -f /tmp/tpu_queue_r4c_done ]; then
    sync_and_commit
    echo "$(date '+%H:%M:%S') all queues done - final commit made" >> "$LOG"
    break
  fi
  sleep 600
done
