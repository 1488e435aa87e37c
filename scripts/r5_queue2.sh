#!/bin/bash
# Round-5 queue, part 2: protocol-grade seed counts (VERDICT #5) + the cheap
# deliverables. Run after queue1 validates the dyna-on minecart config.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue2.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue2 start $(date) ===" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

# EUPG second-setting control first (cheap, ~20s/seed)
run 1800 eupg_fishwood_lr5e4 --seeds=0,1,2,3,4,5,6,7,8,9
# dyna-on minecart to the 10-seed protocol
run 14400 gpipd_minecart --seeds=3,4,5
run 14400 gpipd_minecart --seeds=6,7,8,9
# nodyna to 10 seeds (r4 has 0-4)
run 10800 gpipd_minecart_nodyna --seeds=5,6,7
run 7200  gpipd_minecart_nodyna --seeds=8,9
# population protocol counts (>=5 seeds; r4 has 0-2)
run 7200  morld_halfcheetah --seeds=3,4
run 7200  pgmorl_halfcheetah --seeds=3,4
# PCN remaining seeds
run 7200  pcn_minecart --seeds=1,2

echo "--- profile_gpils $(date +%H:%M:%S)" >> "$LOG"
timeout 2700 python scripts/profile_gpils.py \
  > /root/repo/results/r5/profile_gpils.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

echo "--- bench $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python bench.py > /root/repo/results/r5/bench_r5.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"
echo "=== r5 queue2 done $(date) ===" >> "$LOG"
