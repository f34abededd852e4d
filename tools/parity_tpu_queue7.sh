#!/bin/bash
# Round-5 TPU queue #7: waits for queue6 (countdown pass@G run), then the
# HBM-safe MFU probe.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
while ! grep -q "tpu-queue6.*DONE countdown_solve3" parity_logs/tpu_queue.log 2>/dev/null; do sleep 30; done
sleep 15
echo "[tpu-queue7] $(date -u '+%F %T') START pixel84_probe3" >> parity_logs/tpu_queue.log
timeout 1800 python benchmarks/pixel84_update_probe.py > parity_logs/pixel84_probe3.log 2>&1
echo "[tpu-queue7] $(date -u '+%F %T') DONE pixel84_probe3 rc=$?" >> parity_logs/tpu_queue.log
