#!/bin/bash
# Round-3 TPU measurement batch (fired when the axon tunnel returned).
# Sequential on purpose: one python process at a time through the tunnel.
cd /root/repo
mkdir -p /tmp/tpu_r3
echo "=== start $(date -u) ===" | tee -a /tmp/tpu_r3/log

echo "--- bench mapping (refresh 8) ---" | tee -a /tmp/tpu_r3/log
timeout 3000 python bench.py 2>&1 | tail -3 | tee -a /tmp/tpu_r3/log

echo "--- bench frame (encoder in loop) ---" | tee -a /tmp/tpu_r3/log
BENCH_VARIANT=frame timeout 3000 python bench.py 2>&1 | tail -3 | tee -a /tmp/tpu_r3/log

echo "--- profile pipelined (isotropic bench cloud) ---" | tee -a /tmp/tpu_r3/log
PROF_PIPELINE=8 PROF_ITERS=6 timeout 3600 python tools/profile_step.py 2>&1 | tail -25 | tee -a /tmp/tpu_r3/log

echo "--- profile pipelined (aniso 2, post-split-like cloud) ---" | tee -a /tmp/tpu_r3/log
PROF_ANISO=2 PROF_PIPELINE=8 PROF_ITERS=6 timeout 3600 python tools/profile_step.py 2>&1 | tail -25 | tee -a /tmp/tpu_r3/log

echo "--- bench scannet ---" | tee -a /tmp/tpu_r3/log
BENCH_VARIANT=scannet timeout 3000 python bench.py 2>&1 | tail -3 | tee -a /tmp/tpu_r3/log

echo "=== done $(date -u) ===" | tee -a /tmp/tpu_r3/log
