#!/bin/bash
# Round-5 serial CPU parity-run queue (VERDICT r4 missing #1: re-run and
# COMMIT the curves behind every PARITY.md row).  Runs the BASELINE-config
# scripts back to back on CPU (RLTPU_DEVICE=cpu pins the platform before
# the .axon_site hook can grab the TPU) and logs to parity_logs/.  Scalar
# CSVs land in csv_logs/<run>/scalars/ which is now git-tracked
# (.gitignore only excludes csv_logs/*/videos/).
#
# Keep this queue STRICTLY serial: the box has 2 CPUs and the 8-virtual-
# device IMPALA job can trip XLA's 40s collective rendezvous timeout when
# oversubscribed (CLAUDE.md round-3 lesson).
set -u
cd /root/repo
mkdir -p parity_logs

run() {
  local name=$1 tmo=$2; shift 2
  echo "[queue] $(date -u '+%F %T') START $name" >> parity_logs/queue.log
  local t0=$SECONDS
  timeout "$tmo" "$@" > "parity_logs/$name.log" 2>&1
  local rc=$?
  echo "[queue] $(date -u '+%F %T') DONE $name rc=$rc wall=$((SECONDS-t0))s" >> parity_logs/queue.log
}

export RLTPU_DEVICE=cpu
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

run dqn_cartpole   5400  python examples/dqn_cartpole.py total_frames=500000
run ppo_pendulum   5400  python examples/ppo_pendulum.py
run crossq_pendulum 7200 python sota/crossq_pendulum.py
run sac_halfcheetah 16200 python examples/sac_halfcheetah.py
run impala_cartpole 10800 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/impala_cartpole.py total_frames=1000000
run ppo_halfcheetah 10800 python sota/ppo_halfcheetah.py

echo "[queue] $(date -u '+%F %T') ALL DONE" >> parity_logs/queue.log
