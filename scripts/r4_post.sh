#!/bin/bash
# Post-queue round-4 work on the TPU chip (run AFTER scripts/r4_queue.sh):
#   1. IPRO/DST front-recovery run (VERDICT #6 done-criterion)
#   2. population-workload profiling + env sweep (VERDICT #4)
#   3. 10-seed TPE sweep demo on Envelope/DST (VERDICT #10)
#   4. bench.py -> results/r4/bench_r4.jsonl
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r4/post.log
mkdir -p /root/repo/results/r4
echo "=== r4 post start $(date) ===" >> "$LOG"

echo "--- ipro_dst $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python scripts/parity.py ipro_dst --seeds=0 >> "$LOG" 2>&1
echo "--- rc=$?" >> "$LOG"

echo "--- profile_population $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python scripts/profile_population.py --sweep \
  > /root/repo/results/r4/profile_population.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

echo "--- sweep demo $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python -m morl_baselines_tpu.cli.sweep --algo envelope \
  --env-id deep-sea-treasure-v0 --ref-point 0 -50 \
  --space-file configs/sweeps/envelope.json --tpe \
  --num-trials 10 --num-seeds 10 --num-timesteps 30000 \
  --out /root/repo/results/r4/sweep_envelope_dst.jsonl >> "$LOG" 2>&1
echo "--- rc=$?" >> "$LOG"

echo "--- bench $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python bench.py > /root/repo/results/r4/bench_r4.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"
echo "=== r4 post done $(date) ===" >> "$LOG"
