#!/bin/bash
# Round-5 queue 1b (rebalanced after the ipro oracle-schedule fix): waits for
# any in-flight parity phase, then runs the remaining deliverables in value
# order under the round's wall budget.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue1b.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue1b start $(date) ===" >> "$LOG"

# wait out the orphaned phase from queue1 (chip must stay single-tenant)
while pgrep -f "python scripts/parity.py" > /dev/null; do sleep 20; done
echo "--- chip free $(date +%H:%M:%S)" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 2700 mpmoql_dst --seeds=0,1,2
run 2700 mosac_hopper --seeds=0,1,2
run 2700 capql_hopper --seeds=0,1,2
# corrected IPRO oracle schedules (ramp completes mid-call)
run 3600 ipro_dst --seeds=0,1,2
run 1800 eupg_fishwood_lr5e4 --seeds=0,1,2,3,4,5,6,7,8,9

echo "--- profile_gpils $(date +%H:%M:%S)" >> "$LOG"
timeout 2700 python scripts/profile_gpils.py \
  > /root/repo/results/r5/profile_gpils.jsonl 2>> "$LOG"
echo "--- rc=$?" >> "$LOG"

run 3000 pcn_minecart --seeds=0
# rare-sale-weighted dyna fit: the bounded-epoch substitute probe
run 7200 gpipd_minecart_rw --seeds=3,4
run 7200 gpipd_hopper --seeds=0,1,2
echo "=== r5 queue1b done $(date) ===" >> "$LOG"
