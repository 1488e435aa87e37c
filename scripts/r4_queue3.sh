#!/bin/bash
# Round-4 queue, part 3: protocol seeds for the canonical GPI-PD config and
# whatever else fits before round end.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r4/queue3.log
mkdir -p /root/repo/results/r4
echo "=== r4 queue3 start $(date) ===" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 4500 gpipd_minecart_nodyna --seeds=1,2
run 3600 ipro_dst --seeds=0
run 7200 envelope_minecart --seeds=6,7,8,9
run 3600 pgmorl_halfcheetah --seeds=2
run 3600 gpipd_hopper --seeds=0
run 3600 gpils_cont_hopper_500k --seeds=0

echo "--- profile_population rerun (post physics fix) $(date +%H:%M:%S)" >> "$LOG"
timeout 2700 python scripts/profile_population.py --sweep \
  > /root/repo/results/r4/profile_population_postfix.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

echo "--- bench rerun (post physics fix) $(date +%H:%M:%S)" >> "$LOG"
timeout 4500 python bench.py > /root/repo/results/r4/bench_r4_postfix.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"
echo "=== r4 queue3 done $(date) ===" >> "$LOG"
