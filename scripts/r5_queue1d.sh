#!/bin/bash
# Round-5 queue 1d: the decisive dyna-on test (w/provenance decoupling fix)
# then hopper protocol, then the queue2 essentials.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue1d.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue1d start $(date) ===" >> "$LOG"

while pgrep -f "python scripts/parity.py" > /dev/null; do sleep 20; done
echo "--- chip free $(date +%H:%M:%S)" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 7200 gpipd_minecart --seeds=5,6
run 7200 gpipd_hopper --seeds=0,1

echo "--- bench $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python bench.py > /root/repo/results/r5/bench_r5.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

run 5400 morld_halfcheetah --seeds=3,4
run 7200 gpipd_minecart --seeds=7,8
run 7200 gpipd_minecart_nodyna --seeds=5,6
echo "=== r5 queue1d done $(date) ===" >> "$LOG"
