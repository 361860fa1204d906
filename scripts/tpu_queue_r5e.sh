#!/bin/bash
# Round-5e TPU queue: canonical-bench batch bump (256 -> 1024).
#
# q30 measured the parity batch sweep on-chip: 4,469 / 4,703 / 4,794 /
# 4,857 clips/s at 128 / 256 / 512 / 1024 — the chain tail's final select
# and the dispatch fixed cost are per-DISPATCH, so throughput keeps rising
# past the old canonical batch 256.  bench.py now defaults to 1024.
#
#   q31 extended sweep       — 1024/1536/2048: is there headroom left?
#                              (2048 is ~3.6 GB of audio input; an OOM
#                              failure is tolerated and informative)
#   q32 bench canonical      — re-capture at HEAD with batch 1024
#
# Same contract as tpu_queue_r5d.sh: relay poll, per-job resume markers,
# path-scoped auto-commits.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r5e.log
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
echo "$(date '+%H:%M:%S') relay UP - starting r5e queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q3[12]_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r5e.log"
  local paths=("$DEST" bench_details.json)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r5e): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r5e.sh as the batch-bump queue drains.

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

run 31 sweep_wide python scripts/probe_batch_sweep.py 1024 1536 2048
run 32 bench_b1024 python bench.py
echo "$(date '+%H:%M:%S') R5E QUEUE DONE" >> "$LOG"
commit_artifacts
