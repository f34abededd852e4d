#!/bin/bash
# Round-5 serial TPU parity-run queue.  ONE python process at a time may
# hold the tunneled v5e grant (CLAUDE.md); run this queue alone and never
# start another TPU process while it is running.  Each job is under
# `timeout` so a wedge cannot hold the grant past its budget.
set -u
cd /root/repo
mkdir -p parity_logs
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "[tpu-queue] $(date -u '+%F %T') START $name" >> parity_logs/tpu_queue.log
  local t0=$SECONDS
  timeout "$tmo" "$@" > "parity_logs/$name.log" 2>&1
  local rc=$?
  echo "[tpu-queue] $(date -u '+%F %T') DONE $name rc=$rc wall=$((SECONDS-t0))s" >> parity_logs/tpu_queue.log
  sleep 10   # let the tunnel grant release cleanly between jobs
}

run dqn_breakout 9000  python sota/dqn_breakout.py total_frames=3000000
run ppo_breakout 5400  python examples/ppo_breakout.py total_frames=6000000
run grpo_10m     5400  python sota/grpo_10m.py iters=400

echo "[tpu-queue] $(date -u '+%F %T') ALL DONE" >> parity_logs/tpu_queue.log
