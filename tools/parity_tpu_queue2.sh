#!/bin/bash
# Round-5 TPU queue #2: MFU probe + breakout evidence runs.
# Serial; run only when no other TPU process is alive.
set -u
cd /root/repo
mkdir -p parity_logs
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "[tpu-queue2] $(date -u '+%F %T') START $name" >> parity_logs/tpu_queue.log
  local t0=$SECONDS
  timeout "$tmo" "$@" > "parity_logs/$name.log" 2>&1
  echo "[tpu-queue2] $(date -u '+%F %T') DONE $name rc=$? wall=$((SECONDS-t0))s" >> parity_logs/tpu_queue.log
  sleep 10
}

run pixel84_probe    1800 python benchmarks/pixel84_update_probe.py
run ppo_breakout_anneal 5400 python examples/ppo_breakout.py total_frames=10000000 anneal_lr=True
run dqn_breakout_6m  10800 python sota/dqn_breakout.py total_frames=6000000

echo "[tpu-queue2] $(date -u '+%F %T') ALL DONE" >> parity_logs/tpu_queue.log
