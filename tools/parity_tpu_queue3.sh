#!/bin/bash
# Round-5 TPU queue #3: waits for any live grpo_10m process to exit, then
# runs the countdown SFT+GRPO solve attempt, the pixel84 MFU probe, and
# the breakout evidence runs, strictly serially on the chip.
set -u
cd /root/repo
mkdir -p parity_logs
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

# wait for the solve run to release the TPU grant (poll by exact cmdline)
while pgrep -f "sota/grpo_10m.py sft_iters" > /dev/null 2>&1; do sleep 15; done
sleep 15

run() {
  local name=$1 tmo=$2; shift 2
  echo "[tpu-queue3] $(date -u '+%F %T') START $name" >> parity_logs/tpu_queue.log
  local t0=$SECONDS
  timeout "$tmo" "$@" > "parity_logs/$name.log" 2>&1
  echo "[tpu-queue3] $(date -u '+%F %T') DONE $name rc=$? wall=$((SECONDS-t0))s" >> parity_logs/tpu_queue.log
  sleep 10
}

run countdown_solve  7200 python sota/grpo_countdown.py sft_iters=1500 iters=800
run pixel84_probe    1800 python benchmarks/pixel84_update_probe.py
run ppo_breakout_anneal 5400 python examples/ppo_breakout.py total_frames=10000000 anneal_lr=True
run dqn_breakout_6m  10800 python sota/dqn_breakout.py total_frames=6000000

echo "[tpu-queue3] $(date -u '+%F %T') ALL DONE" >> parity_logs/tpu_queue.log
