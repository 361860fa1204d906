#!/bin/bash
# Round-5 third-wave TPU queue: validate + capture the chain-tail default
# (pipe_tail="chain" — cross-clip select lag, only the global-final grid
# step stitched; measured 53.0 vs 55.6 ms per 256 parity clips against
# "stitch" in scripts/probe_chain_e2e.py).
#
#   q24 parity_v3            — oracle bit parity with the new default
#   q25 tpu_corpus_parity    — five 10x10 matrices, default/highest/fast
#   q26 bench canonical      — new parity clips/s capture
#   q27 bench flagged modes  — matchers, streaming-identify, session pool
#
# Same contract as tpu_queue_r5.sh: polls the relay, per-job resume
# markers, path-scoped auto-commits.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r5c.log
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
echo "$(date '+%H:%M:%S') relay UP - starting r5c queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q2[4-9]_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r5c.log"
  local paths=("$DEST" bench_details.json TPU_PARITY_r05.md)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r5c): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r5c.sh as the chain-tail validation
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

run 24 parity_v3_chain python scripts/parity_v3.py
run 25 corpus_chain python scripts/tpu_corpus_parity.py --highest
run 26 bench_chain python bench.py
run 27 bench_modes_chain python bench.py --packed-64k --million-track --dedup \
    --serving --streaming-identify --session-pool
echo "$(date '+%H:%M:%S') R5C QUEUE DONE" >> "$LOG"
commit_artifacts
