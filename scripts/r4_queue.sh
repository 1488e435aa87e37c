#!/bin/bash
# Round-4 parity queue: runs the BASELINE seed matrix sequentially on the
# real TPU chip (VERDICT r3 next-steps #1, #2, #9).  Each phase under its own
# generous timeout so a hang cannot block the rest of the queue.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r4/queue.log
mkdir -p /root/repo/results/r4
echo "=== r4 queue start $(date) ===" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

# 1. The round's headline question: GPI-PD minecart with the new machinery.
run 14400 gpipd_minecart --seeds=0,1,2
# 2. Protocol seed counts for the cheap configs (10 seeds total each).
run 3600  moql_dst --seeds=3,4,5,6,7,8,9
run 14400 envelope_minecart --seeds=3,4,5,6,7,8,9
# 3. Population seeds 1-2 (MORL/D + PGMORL halfcheetah).
run 14400 morld_halfcheetah --seeds=1,2
run 14400 pgmorl_halfcheetah --seeds=1,2
# 4. Continuous GPI-PD hopper (3 seeds) + 500k GPI-LS control.
run 14400 gpipd_hopper --seeds=0,1,2
run 7200  gpils_cont_hopper_500k --seeds=0
echo "=== r4 queue done $(date) ===" >> "$LOG"
