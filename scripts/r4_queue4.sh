#!/bin/bash
# Round-4 queue, part 4 (opportunistic end-of-round seeds): commit after each
# completed run so nothing finished is ever left uncommitted.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r4/queue4.log
echo "=== r4 queue4 start $(date) ===" >> "$LOG"

for s in 4 5 6; do
  timeout 2100 python scripts/parity.py gpipd_minecart_nodyna --seeds=$s >> "$LOG" 2>&1
  git add results/r4 && git commit -q -m "results/r4: nodyna seed $s" >> "$LOG" 2>&1
done
echo "=== r4 queue4 done $(date) ===" >> "$LOG"
