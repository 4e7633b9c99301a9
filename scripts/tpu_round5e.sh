#!/bin/bash
# Round-5 part E — the round's headline, measured on an IDLE host:
# the part-C flagship_headline leg (157.69 clips/s) overlapped the
# fast-tier pytest run on this 1-core host; with the b32k8 phase-loss
# program now cached this rerun is ~10 min and carries the honest number.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r5.log
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO
run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}
run flagship_headline_clean 3600 python bench.py
echo "R5 PART E ALL DONE $(date)" | tee -a $LOG
