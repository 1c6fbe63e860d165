#!/bin/bash
# One-shot TPU re-measurement after the round-3 kernel work (run when the
# axon tunnel is up). Serializes the jobs; logs land in /tmp.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 3600 python benches/bench_ops.py > /tmp/bench_ops_final.log 2>&1
timeout 1800 python bench.py > /tmp/bench_final.log 2>&1
timeout 1200 python scripts/profile_kitti.py > /tmp/profile_kitti_final.log 2>&1
timeout 1800 python scripts/micro_layout_r3.py > /tmp/micro_layout_final.log 2>&1
timeout 1200 python examples/kitti_obstacle_detection.py > /tmp/kitti_drive_final.log 2>&1
timeout 2400 python scripts/micro_ab_r3c.py > /tmp/micro_ab_r3c.log 2>&1
echo DONE
