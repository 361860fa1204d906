#!/bin/bash
# Round-5 final-confirmation TPU queue: the relay went down right after the
# r5c captures landed (bench.py's structured-failure path got a live
# verification out of it).  When it returns, re-confirm the tree at HEAD —
# no device code changed since q24-q27, so these are freshness/consistency
# captures, and they warm the relay's compile cache for the driver's
# end-of-round bench:
#
#   q28 parity_v3            — oracle bit parity at HEAD (expect ~99.92%)
#   q29 bench canonical      — parity clips/s (expect ~4.8k)
#   q30 batch sweep          — does batch > 256 amortize the chain tail's
#                              per-dispatch cost? (128/256/512/1024)
#
# Same contract as tpu_queue_r5c.sh: relay poll, per-job resume markers,
# path-scoped auto-commits.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r5d.log
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
echo "$(date '+%H:%M:%S') relay UP - starting r5d queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q2[89]_*.log /tmp/q30_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r5d.log"
  local paths=("$DEST" bench_details.json)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r5d): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r5d.sh as the final-confirmation
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
  if timeout 3600 "$@" > "/tmp/q${n}_${name}.log" 2>&1; then
    echo "$(date '+%H:%M:%S') q$n rc=0" >> "$LOG"
    touch "/tmp/q${n}_done"
  else
    echo "$(date '+%H:%M:%S') q$n rc=$? (see /tmp/q${n}_${name}.log)" >> "$LOG"
  fi
  commit_artifacts
}

run 28 parity_head python scripts/parity_v3.py
run 29 bench_head python bench.py
run 30 batch_sweep python scripts/probe_batch_sweep.py
echo "$(date '+%H:%M:%S') R5D QUEUE DONE" >> "$LOG"
commit_artifacts
