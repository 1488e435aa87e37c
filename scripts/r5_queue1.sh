#!/bin/bash
# Round-5 queue, part 1: validate the headline (dyna-on GPI-PD seeds 1-2),
# then the VERDICT deliverables in value order — IPRO DST 3 seeds, the five
# previously-unproven algorithms 3 seeds each, continuous GPI-PD hopper 5
# seeds under the convergence-fit protocol.  Each phase under its own
# timeout so a hang cannot block the rest.
set -u
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
LOG=/root/repo/results/r5/queue1.log
mkdir -p /root/repo/results/r5
echo "=== r5 queue1 start $(date) ===" >> "$LOG"

run() {
  local t=$1; shift
  echo "--- [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$t" python scripts/parity.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)] $*" >> "$LOG"
}

run 5400 gpipd_minecart --seeds=0
run 7200 gpipd_minecart --seeds=1,2
run 5400 ipro_dst --seeds=0,1,2
run 2700 pql_dst --seeds=0,1,2
run 2700 mpmoql_dst --seeds=0,1,2
run 2700 mosac_hopper --seeds=0,1,2
run 2700 capql_hopper --seeds=0,1,2
run 3600 pcn_minecart --seeds=0
run 7200 gpipd_hopper --seeds=0,1,2,3,4
echo "=== r5 queue1 done $(date) ===" >> "$LOG"
