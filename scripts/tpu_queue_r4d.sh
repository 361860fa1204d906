#!/bin/bash
# Round-4 fourth-wave TPU queue: the pipe_tail regression fix.
#
# The round-4 drain (q1-q9) showed the lag_t fold had serialised the
# in-kernel select against the matmuls (69.5 ms/256 vs round-3's 56 ms);
# the default is now back to the round-3 t-lag + outside-stitch variant.
# This queue validates and re-captures with the restored default:
#   q10 ab_pipe_tail.py        — 4-way A/B (rows-only / serial / stitch /
#                                fold) + on-chip bit agreement
#   q11 parity_v3.py           — oracle bit parity with the new default
#   q12 tpu_corpus_parity.py   — five matrices with the new default
#   q13 bench.py               — canonical headline re-capture
#   q14 validate_batch_lag.py  — proc batch-lag validation (413 fixed:
#                                big arrays passed as jit arguments)
#
# Commits artifacts path-scoped after every job (same contract as
# scripts/tpu_queue_commit.sh) so results survive session loss.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r4d.log
DEST=scripts/queue_logs_r04
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
echo "$(date '+%H:%M:%S') relay UP - starting r4d queue" >> "$LOG"

commit_artifacts() {
  for f in /tmp/q[0-9]*_*.log; do
    [ -f "$f" ] || continue
    tail -c 200000 "$f" > "$DEST/$(basename "$f")"
  done
  grep -v "relay down; sleeping" "$LOG" | tail -c 50000 > "$DEST/tpu_queue_r4d.log"
  local paths=("$DEST" TPU_PARITY_r04.md bench_details.json)
  local dirty=()
  for p in "${paths[@]}"; do
    [ -e "$p" ] || continue
    [ -n "$(git status --porcelain -- "$p")" ] && dirty+=("$p")
  done
  if [ "${#dirty[@]}" -gt 0 ]; then
    git add -- "${dirty[@]}"
    git commit -q -m "TPU queue artifacts (r4d): ${dirty[*]}

Auto-committed by scripts/tpu_queue_r4d.sh as the pipe_tail revalidation
queue drains.

No-Verification-Needed: measurement artifacts only" -- "${dirty[@]}"
  fi
}

run() {  # run <n> <logname> <cmd...>
  local n=$1 name=$2; shift 2
  echo "$(date '+%H:%M:%S') q$n start: $*" >> "$LOG"
  timeout 3600 "$@" > "/tmp/q${n}_${name}.log" 2>&1
  echo "$(date '+%H:%M:%S') q$n rc=$?" >> "$LOG"
  commit_artifacts
}

run 10 ab_pipe_tail    python scripts/ab_pipe_tail.py
run 11 parity_v3_r4d   python scripts/parity_v3.py
run 12 corpus_r4d      python scripts/tpu_corpus_parity.py --highest
run 13 bench_r4d       python bench.py
run 14 batch_lag_r4d   python scripts/validate_batch_lag.py
echo "$(date '+%H:%M:%S') R4D QUEUE DONE" >> "$LOG"
commit_artifacts
touch /tmp/tpu_queue_r4d_done
