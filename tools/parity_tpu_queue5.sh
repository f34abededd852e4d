#!/bin/bash
# Round-5 TPU queue #5: waits for queue4 (countdown re-run), then the fixed
# MFU probe and a full bench.py validation.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
while ! grep -q "tpu-queue4.*DONE countdown_solve2" parity_logs/tpu_queue.log 2>/dev/null; do sleep 30; done
sleep 15
echo "[tpu-queue5] $(date -u '+%F %T') START pixel84_probe2" >> parity_logs/tpu_queue.log
timeout 1800 python benchmarks/pixel84_update_probe.py > parity_logs/pixel84_probe2.log 2>&1
echo "[tpu-queue5] $(date -u '+%F %T') DONE pixel84_probe2 rc=$?" >> parity_logs/tpu_queue.log
sleep 10
echo "[tpu-queue5] $(date -u '+%F %T') START bench_validate" >> parity_logs/tpu_queue.log
timeout 3600 python bench.py > parity_logs/bench_validate.log 2>&1
echo "[tpu-queue5] $(date -u '+%F %T') DONE bench_validate rc=$?" >> parity_logs/tpu_queue.log
