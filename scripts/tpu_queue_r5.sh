#!/bin/bash
# Round-5 TPU queue: final-round validation artifacts.
#
#   q15 probe_proc_splitk.py   — real-shape split-K stage-2 head-to-head
#                                (VERDICT r3 #7) + the proc tps sweep
#   q16 tpu_corpus_parity.py   — five matrices -> TPU_PARITY_r05.md
#   q17 bench.py               — canonical headline capture
#   q18 bench.py flagged       — secondary metrics refresh
#
# Polls the relay and drains when it is up; commits artifacts path-scoped
# after every job (same contract as scripts/tpu_queue_r4d.sh) so results
# survive session loss.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r5.log
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
echo "$(date '+%H:%M:%S') relay UP - starting r5 queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q1[5-9]_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r5.log"
  local paths=("$DEST" TPU_PARITY_r05.md bench_details.json)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r5): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r5.sh as the round-5 validation
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

run 15 splitk_r5       python scripts/probe_proc_splitk.py
run 16 corpus_r5       python scripts/tpu_corpus_parity.py --highest
run 17 bench_r5        python bench.py
run 18 bench_modes_r5  python bench.py --packed-64k --million-track --dedup --streaming-identify --serving --session-pool
echo "$(date '+%H:%M:%S') R5 QUEUE DONE" >> "$LOG"
commit_artifacts
touch /tmp/tpu_queue_r5_done
