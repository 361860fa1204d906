#!/bin/bash
# Round-4 follow-up TPU queue: waits for the primary queue (tpu_queue.sh ->
# /tmp/tpu_queue_done), then runs the round-4 additions.
#   q8 probe_k_depth.py — MXU K-depth cost curve; decides the proc split-K
#      family (ROUND_NOTES round-4 lead: proc stage-1 sharing)
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r4b.log
: > "$LOG"

until [ -f /tmp/tpu_queue_done ]; do
  sleep 120
done
echo "$(date '+%H:%M:%S') primary queue done - starting r4b" >> "$LOG"

run() {  # run <n> <logname> <cmd...>
  local n=$1 name=$2; shift 2
  echo "$(date '+%H:%M:%S') q$n start: $*" >> "$LOG"
  timeout 3600 "$@" > "/tmp/q${n}_${name}.log" 2>&1
  echo "$(date '+%H:%M:%S') q$n rc=$?" >> "$LOG"
}

run 8 k_depth python scripts/probe_k_depth.py
echo "$(date '+%H:%M:%S') R4B QUEUE DONE" >> "$LOG"
touch /tmp/tpu_queue_r4b_done
