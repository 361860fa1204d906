#!/bin/bash
# Round-4 TPU work queue: waits for the axon relay to come back, then runs
# the pending on-chip jobs in dependency order.  Logs to /tmp/tpu_queue.log
# and /tmp/q[1-7]_*.log; touches /tmp/tpu_queue_done when finished.
#
# Queue (in order — VERDICT r3 next-round #1 first):
#   q1 validate_batch_lag.py   — batch-lag pipe_select bit-exactness + proc timing
#   q2 parity_v3.py            — on-chip oracle bit parity of the v3 kernel
#   q3 tpu_corpus_parity.py    — five matrices with pipe_select as shipped default
#   q4 bench.py                — canonical headline (parity clips/s with pipe_select)
#   q5 bench.py flagged modes  — packed-64k / million-track (incl. phase-robust
#                                vs phase-1 coarse A/B) / dedup / serving /
#                                streaming-identify (VERDICT r3 #5)
#   q6 sweep_tps_pipe.py       — tps re-sweep under the overlapped select
#   q7 probe_pipe_residual.py  — attribute the ~6 ms non-rows residual
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
LOG=/tmp/tpu_queue.log
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
echo "$(date '+%H:%M:%S') relay UP - starting queue" >> "$LOG"

run() {  # run <n> <logname> <cmd...>
  local n=$1 name=$2; shift 2
  echo "$(date '+%H:%M:%S') q$n start: $*" >> "$LOG"
  timeout 3600 "$@" > "/tmp/q${n}_${name}.log" 2>&1
  echo "$(date '+%H:%M:%S') q$n rc=$?" >> "$LOG"
}

run 1 batch_lag       python scripts/validate_batch_lag.py
run 2 parity_v3       python scripts/parity_v3.py
run 3 corpus_parity   python scripts/tpu_corpus_parity.py --highest
run 4 bench           python bench.py
run 5 bench_modes     python bench.py --packed-64k --million-track --dedup --serving --streaming-identify
run 6 sweep_tps_pipe  python scripts/sweep_tps_pipe.py
run 7 pipe_residual   python scripts/probe_pipe_residual.py
echo "$(date '+%H:%M:%S') QUEUE DONE" >> "$LOG"
touch /tmp/tpu_queue_done
