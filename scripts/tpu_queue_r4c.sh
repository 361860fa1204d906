#!/bin/bash
# Round-4 third-wave TPU queue: waits for the r4b queue
# (/tmp/tpu_queue_r4b_done), then runs the late-round additions.
#   q9 bench.py --session-pool — pooled vs per-session live-recognition
#      posts/s on chip (the slot-batched session pool's headline number)
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue_r4c.log
: > "$LOG"

until [ -f /tmp/tpu_queue_r4b_done ]; do
  sleep 120
done
echo "$(date '+%H:%M:%S') r4b queue done - starting r4c" >> "$LOG"

run() {  # run <n> <logname> <cmd...>
  local n=$1 name=$2; shift 2
  echo "$(date '+%H:%M:%S') q$n start: $*" >> "$LOG"
  timeout 3600 "$@" > "/tmp/q${n}_${name}.log" 2>&1
  echo "$(date '+%H:%M:%S') q$n rc=$?" >> "$LOG"
}

run 9 session_pool python bench.py --session-pool
echo "$(date '+%H:%M:%S') R4C QUEUE DONE" >> "$LOG"
touch /tmp/tpu_queue_r4c_done
