#!/bin/bash
# Round-5 second-wave TPU queue: re-capture the streaming-identify section
# warm (the q18 capture's incremental ticks/s was poisoned by one cold
# compile tick — 4 ticks total, so one outlier dominates n_ticks/dt while
# the median tick still showed incremental 2.2x faster than full).
#
#   q19 bench.py --streaming-identify  — warm re-capture
#
# Polls the relay (down again since ~09:30) and drains when it returns;
# commits artifacts path-scoped (same contract as tpu_queue_r5.sh).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r5b.log
DEST=scripts/queue_logs_r05
mkdir -p "$DEST"
: > "$LOG"

probe() {
  timeout 120 python -c '
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
print("relay up:", jax.devices())
'
}

until probe >> "$LOG" 2>&1; do
  echo "$(date '+%H:%M:%S') relay down; sleeping 8 min" >> "$LOG"
  sleep 480
done
echo "$(date '+%H:%M:%S') relay UP - starting r5b queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q19_*.log /tmp/q2[0-9]_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r5b.log"
  local paths=("$DEST" bench_details.json)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r5b): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r5b.sh as the second-wave round-5
queue drains.

No-Verification-Needed: measurement artifacts only" -- "${dirty[@]}"
  fi
}

run() {  # run <n> <logname> <cmd...>
  local n=$1 name=$2; shift 2
  if [ -f "/tmp/q${n}_done" ]; then
    echo "$(date '+%H:%M:%S') q$n already done; skipping" >> "$LOG"
    return
  fi
  echo "$(date '+%H:%M:%S') q$n start: $*" >> "$LOG"
  timeout 7200 "$@" > "/tmp/q${n}_${name}.log" 2>&1
  local rc=$?
  echo "$(date '+%H:%M:%S') q$n rc=$rc" >> "$LOG"
  [ "$rc" -eq 0 ] && touch "/tmp/q${n}_done"
  commit_artifacts
}

run 19 streamid_r5b    python bench.py --streaming-identify
echo "$(date '+%H:%M:%S') R5B QUEUE DONE" >> "$LOG"
commit_artifacts
touch /tmp/tpu_queue_r5b_done
