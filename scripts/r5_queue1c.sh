#!/bin/bash
# Round-5 queue 1c (post GAE-fix): finer IPRO decomposition, termination-fix
# attribution seeds for dyna-on minecart, hopper protocol seeds.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue1c.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue1c start $(date) ===" >> "$LOG"

while pgrep -f "python scripts/parity.py" > /dev/null; do sleep 20; done
echo "--- chip free $(date +%H:%M:%S)" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 2700 ipro_dst_fine --seeds=0,1,2
# plain dyna-on with the reward-keyed imagined termination (seeds 0-2 ran
# without it): isolates the termination fix before the rw probe
run 7200 gpipd_minecart --seeds=3,4
run 5400 gpipd_minecart_rw --seeds=5
run 9000 gpipd_hopper --seeds=0,1,2
echo "=== r5 queue1c done $(date) ===" >> "$LOG"
