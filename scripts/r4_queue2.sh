#!/bin/bash
# Round-4 queue, part 2 (time-aware reorder): GPI-PD forgetting ablations
# first (the round's headline question), then the seed matrix, then the
# explicit VERDICT deliverables (ipro_dst, profiling, sweep demo, bench).
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r4/queue2.log
mkdir -p /root/repo/results/r4
echo "=== r4 queue2 start $(date) ===" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 3600 gpipd_minecart_nodyna --seeds=0
run 4500 gpipd_minecart_strongmodel --seeds=0
run 1800 moql_dst --seeds=3,4,5,6,7,8,9
run 3600 envelope_minecart --seeds=3,4,5
run 4500 morld_halfcheetah --seeds=1,2
run 3600 pgmorl_halfcheetah --seeds=1
run 2700 ipro_dst --seeds=0

echo "--- profile_population $(date +%H:%M:%S)" >> "$LOG"
timeout 2700 python scripts/profile_population.py --sweep \
  > /root/repo/results/r4/profile_population.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

echo "--- sweep demo $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python -m morl_baselines_tpu.cli.sweep --algo envelope \
  --env-id deep-sea-treasure-v0 --ref-point 0 -50 \
  --space-file configs/sweeps/envelope.json --tpe \
  --num-trials 8 --num-seeds 10 --num-timesteps 30000 \
  --out /root/repo/results/r4/sweep_envelope_dst.jsonl >> "$LOG" 2>&1
echo "--- rc=$?" >> "$LOG"

echo "--- bench $(date +%H:%M:%S)" >> "$LOG"
timeout 4500 python bench.py > /root/repo/results/r4/bench_r4.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"
echo "=== r4 queue2 done $(date) ===" >> "$LOG"
