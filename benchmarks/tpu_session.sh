#!/bin/bash
# One consolidated TPU session: sequential processes, each claiming the
# tunnel grant after the previous exits cleanly.  Never kill these by
# pattern; each runs under its own timeout.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_session.log}
{
  echo "=== [1/3] bench.py $(date)"
  timeout 2400 python -u bench.py
  echo "bench exit=$?"
  echo "=== [2/3] PPO Breakout 10M $(date)"
  timeout 3000 python -u -c "
from examples.ppo_breakout import main
main({'total_frames': 10_000_000})
"
  echo "breakout exit=$?"
  echo "=== [3/3] host-bridge A/B $(date)"
  timeout 1200 python -u -c "
import sys; sys.path.insert(0, '.')
from benchmarks.bench_host_bridge import main_cli
main_cli(['steps=500', 'sac_iters=5'])
"
  echo "bridge exit=$?"
  echo "=== done $(date)"
} >> "$LOG" 2>&1
