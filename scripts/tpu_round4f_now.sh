#!/bin/bash
# Part-F priority legs (tunnel confirmed up 07:51): paired ref + the two
# cheap levers, then combined.  Decision rule: flip defaults on >=0.5%.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r4f.log
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO
run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}
run step_full_ref_f 2400 python scripts/profile_step.py full
run step_x11_eager 2400 env SAP3D_CONCAT_EAGER_SITES=x_1_1 python scripts/profile_step.py full
run step_head_phase_loss 2400 env SAP3D_HEAD_PHASE_LOSS=1 python scripts/profile_step.py full
run step_x11_and_phase 2400 env SAP3D_CONCAT_EAGER_SITES=x_1_1 SAP3D_HEAD_PHASE_LOSS=1 python scripts/profile_step.py full
echo "PART F PRIORITY DONE $(date)" | tee -a $LOG
