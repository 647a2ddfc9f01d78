#!/bin/bash
# Batched TPU measurement session (round 3, post-tunnel-recovery).
# One process per experiment; run serially so remote compiles don't contend.
# Fire with: nohup bash tools/tpu_session_r3b.sh > /tmp/tpu_r3b.log 2>&1 &
set -x
cd /root/repo

echo "=== [1/4] profiler, bench scene (isotropic) ==="
timeout 3000 python tools/profile_step.py 2>&1 | tail -40

echo "=== [2/4] profiler, anisotropy-stretched (post-split operating point) ==="
PROF_ANISO=1.5 timeout 3000 python tools/profile_step.py 2>&1 | tail -40

echo "=== [3/4] bench mapping variant ==="
timeout 3000 python bench.py 2>&1 | tail -5

echo "=== [4/4] bench frame variant ==="
BENCH_VARIANT=frame timeout 3000 python bench.py 2>&1 | tail -5

echo "=== done ==="
