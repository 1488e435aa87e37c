#!/bin/bash
# Round-5 queue 1e (opportunistic tail): population protocol seeds + nodyna
# extension while wall-clock remains.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue1e.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue1e start $(date) ===" >> "$LOG"

while ! grep -q "r5 queue1d done" /root/repo/results/r5/queue1d.log 2>/dev/null; do sleep 30; done
while pgrep -f "python scripts/parity.py" > /dev/null; do sleep 20; done
echo "--- chip free $(date +%H:%M:%S)" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 5400 pgmorl_halfcheetah --seeds=3,4
run 7200 gpipd_minecart_nodyna --seeds=7,8
run 7200 gpipd_minecart --seeds=9
echo "=== r5 queue1e done $(date) ===" >> "$LOG"
